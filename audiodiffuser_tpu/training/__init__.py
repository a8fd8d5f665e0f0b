from .ema import PowerFunctionEMA, TraditionalEMA, reconstruct_posthoc, solve_posthoc_coefficients
from .trainer import Trainer, TrainState

__all__ = [
    "PowerFunctionEMA",
    "Trainer",
    "TrainState",
    "TraditionalEMA",
    "reconstruct_posthoc",
    "solve_posthoc_coefficients",
]
