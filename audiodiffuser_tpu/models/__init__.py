"""Denoiser backbones (Flax, channels-last layouts).

- ``unet1d``     1D Efficient-UNet over raw waveforms ([B, T, C])
- ``unet2d``     Imagen-style 2D UNet over spectrograms ([B, F, T, C])
- ``unet2d_adm`` ADM / guided-diffusion UNet
- ``dit``        Diffusion Transformer (adaLN-Zero)
- ``wavenet``    DiffWave dilated-conv denoiser
- ``dac``        Descript Audio Codec (+RVQ, +VAE head) for latent diffusion
- ``conditioner`` label/text/timestep CFG conditioners
"""

from .dac import DAC, FineTuneAutoencoder, ResidualVectorQuantize
from .dit import DiT
from .unet1d import UNet1d, UNet1dBase
from .unet2d import UNet2dBase
from .unet2d_adm import UNetModel
from .wavenet import WaveNetNoise

__all__ = [
    "DAC",
    "DiT",
    "FineTuneAutoencoder",
    "ResidualVectorQuantize",
    "UNet1d",
    "UNet1dBase",
    "UNet2dBase",
    "UNetModel",
    "WaveNetNoise",
]
