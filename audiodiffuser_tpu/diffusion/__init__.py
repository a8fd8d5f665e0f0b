from .formulations import (
    Diffusion,
    EluDiffusion,
    ReFlow,
    VDiffusion,
    VEDiffusion,
    VPDiffusion,
)

__all__ = [
    "Diffusion",
    "EluDiffusion",
    "ReFlow",
    "VDiffusion",
    "VEDiffusion",
    "VPDiffusion",
]
