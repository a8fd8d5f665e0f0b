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
from .utils import clip, extend_dim, to_batch

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
    "extend_dim",
    "to_batch",
]
