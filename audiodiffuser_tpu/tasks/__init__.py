from .diffusion_task import DiffusionSpecTask
from .latent_task import DiffusionLatentTask
from .mel_task import DiffusionMelTask
from .waveform_task import DiffusionWaveformTask

__all__ = [
    "DiffusionLatentTask",
    "DiffusionMelTask",
    "DiffusionSpecTask",
    "DiffusionWaveformTask",
]
