from .diffusion_task import DiffusionSpecTask
from .mel_task import DiffusionMelTask
from .waveform_task import DiffusionWaveformTask

__all__ = ["DiffusionMelTask", "DiffusionSpecTask", "DiffusionWaveformTask"]
