"""Sampler library: ODE/SDE solvers compiled as lax.scan loops.

Four families matching the reference's four sampler files:

- ``edm``        x0-predicting (EDM-preconditioned) nets
- ``stochastic`` ancestral / SDE samplers for x0 nets
- ``vobj``       v-prediction nets in logSNR space
- ``rf``         rectified-flow velocity nets
"""

from . import edm, pf, rf, stochastic, vobj
from .base import BrownianBridgeNoise, ancestral_sigmas, append_zero, churn_gammas
from .edm import (
    DPM2MSampler,
    DPM2Sampler,
    DPMSampler,
    EDMAlphaSampler,
    EDMSampler,
    LMSSampler,
    UniPCSampler,
    VESampler,
    VPSampler,
)
from .pf import PFDiffSampler
from .stochastic import ADPM2Sampler, ADPMPP2SSampler, DPMPPSDESampler
from .vobj import VEulerSampler, VSampler

__all__ = [
    "ADPM2Sampler",
    "ADPMPP2SSampler",
    "BrownianBridgeNoise",
    "DPM2MSampler",
    "DPM2Sampler",
    "DPMPPSDESampler",
    "DPMSampler",
    "EDMAlphaSampler",
    "EDMSampler",
    "LMSSampler",
    "PFDiffSampler",
    "UniPCSampler",
    "VESampler",
    "VPSampler",
    "VEulerSampler",
    "VSampler",
    "ancestral_sigmas",
    "append_zero",
    "churn_gammas",
    "edm",
    "pf",
    "rf",
    "stochastic",
    "vobj",
]
