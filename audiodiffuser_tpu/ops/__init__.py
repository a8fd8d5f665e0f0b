from .distributions import (
    LogitDistribution,
    LogNormalDistribution,
    LogUniformDistribution,
    UniformDistribution,
)
from .schedules import (
    GeometricSchedule,
    KarrasSchedule,
    LinearSchedule,
    RFEDMSchedule,
    VESchedule,
    VPSchedule,
    VSchedule,
)
from .flops import count_flops
from .stft import hann_window, istft, spec_back, spec_fwd, stft
from .utils import clip, extend_dim, sequence_mask, to_batch

__all__ = [
    "GeometricSchedule",
    "KarrasSchedule",
    "LinearSchedule",
    "LogNormalDistribution",
    "LogUniformDistribution",
    "LogitDistribution",
    "RFEDMSchedule",
    "UniformDistribution",
    "VESchedule",
    "VPSchedule",
    "VSchedule",
    "clip",
    "count_flops",
    "extend_dim",
    "hann_window",
    "istft",
    "sequence_mask",
    "spec_back",
    "spec_fwd",
    "stft",
    "to_batch",
]
