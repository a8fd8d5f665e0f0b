"""Load the PyTorch reference implementation as a parity oracle.

The reference at /root/reference is imported read-only and executed on CPU
torch. ``torchsde`` (not installed) is stubbed before import — parity tests
drive the Brownian-tree path with injected noise, never through torchsde.

Usage:
    ref = load_reference()
    out = ref.sampler_edm.DPMSampler(...)(noise, fn=torch_fn, net=None, sigmas=...)
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


class _StubBrownianTree:
    """Placeholder for torchsde.BrownianTree — parity tests must patch the
    reference's noise sampler; using the stub directly is an error."""

    def __init__(self, *a, **kw):
        pass

    def __call__(self, *a, **kw):
        raise RuntimeError(
            "torchsde stub queried: patch BrownianTreeNoiseSampler with "
            "injected noise in parity tests"
        )


def load_reference():
    if "torchsde" not in sys.modules:
        stub = types.ModuleType("torchsde")
        stub.BrownianTree = _StubBrownianTree
        sys.modules["torchsde"] = stub
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import src.models.components.sampler_edm as sampler_edm
    import src.models.components.sampler_rf as sampler_rf
    import src.models.components.sampler_vobj as sampler_vobj
    import src.models.components.stochastic_sampler_edm as stochastic_sampler_edm

    ns = types.SimpleNamespace(
        sampler_edm=sampler_edm,
        sampler_vobj=sampler_vobj,
        sampler_rf=sampler_rf,
        stochastic=stochastic_sampler_edm,
    )
    return ns
