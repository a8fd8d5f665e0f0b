from .diffusion_task import DiffusionSpecTask
from .waveform_task import DiffusionWaveformTask

__all__ = ["DiffusionSpecTask", "DiffusionWaveformTask"]
