"""Sequence-parallel training through the Trainer (``sequence_parallel=N``).

The trainer swaps the DiT's ``attention_core`` for the ring-attention core
(ops/context_parallel.py) over a (data x sp) mesh, so activations stay
token-sharded end to end inside the jitted train step. Ring attention is
exact, so the sp loss must match the plain data-parallel loss to fp32
reduction tolerance — verified on the 8-device virtual CPU mesh (the same
strategy the reference uses for DDP simulation, tests/test_train.py:52-61).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiodiffuser_tpu.diffusion import EluDiffusion
from audiodiffuser_tpu.models.dit import DiT
from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
from audiodiffuser_tpu.ops.schedules import KarrasSchedule
from audiodiffuser_tpu.parallel.mesh import shard_batch
from audiodiffuser_tpu.samplers.edm import EDMSampler
from audiodiffuser_tpu.tasks.waveform_task import DiffusionWaveformTask
from audiodiffuser_tpu.training.trainer import Trainer

TOKENS = 64


def _tiny_dit_task():
    return DiffusionWaveformTask(
        net=DiT(
            input_size=[1, TOKENS],
            patch_size=[1, 1],
            in_channels=1,
            hidden_size=32,
            depth=2,
            num_heads=2,
            mlp_ratio=2.0,
            num_classes=10,
            label_cond=True,
            cond_drop_prob=0.0,
        ),
        diffusion=EluDiffusion(sigma_data=0.2),
        sampler=EDMSampler(s_churn=0.0, num_steps=3, use_heun=False),
        noise_scheduler=KarrasSchedule(0.01, 10.0, num_steps=3),
        noise_distribution=LogNormalDistribution(-1.2, 1.2),
        generated_sample_length=TOKENS,
        generated_sample_class=10,
        use_ema=False,
    )


def _batch(n):
    rng = np.random.default_rng(0)
    return {
        "audio": rng.standard_normal((n, TOKENS)).astype(np.float32) * 0.1,
        "label": (np.arange(n) % 10).astype(np.int32),
    }


class _Loader:
    def __init__(self, batches):
        self.batches = batches
        self.batch_size = batches[0]["audio"].shape[0]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


class _DataModule:
    def __init__(self, batches):
        self.loader = _Loader(batches)
        self.batch_size = self.loader.batch_size

    def train_dataloader(self):
        return self.loader

    def val_dataloader(self):
        return self.loader


def _one_step_loss(trainer, batch, tmp_path):
    state = trainer.init_state(batch)
    trainer._compile()
    sharded = shard_batch(trainer.mesh, batch)
    state, metrics = trainer._compiled_train_step(state, sharded, jax.random.key(7))
    return float(jax.device_get(metrics["train/loss"])), state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sp_train_step_matches_dp(tmp_path):
    """2D (data=2 x sp=4) sequence-parallel loss == plain DP loss, and the
    compiled step actually runs the ring (collective-permute in the HLO)."""
    batch = _batch(8)

    sp = Trainer(
        task=_tiny_dit_task(), optimizer=optax.adamw(1e-4),
        output_dir=str(tmp_path / "sp"), sequence_parallel=4,
    )
    assert sp.sequence_parallel == 4
    assert sp.mesh.shape == {"data": 2, "sp": 4}
    loss_sp, state_sp = _one_step_loss(sp, batch, tmp_path)

    hlo = (
        jax.jit(sp._train_step, donate_argnums=0)
        .lower(state_sp, shard_batch(sp.mesh, batch), jax.random.key(7))
        .compile()
        .as_text()
    )
    assert "collective-permute" in hlo, "ring attention not in the train step"

    dp = Trainer(
        task=_tiny_dit_task(), optimizer=optax.adamw(1e-4),
        output_dir=str(tmp_path / "dp"),
    )
    loss_dp, _ = _one_step_loss(dp, batch, tmp_path)
    assert np.isclose(loss_sp, loss_dp, rtol=2e-4), (loss_sp, loss_dp)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sp_fit_generates_and_checkpoints(tmp_path):
    """Full fit loop under sequence_parallel: epoch + validation (including
    the batch-1 sample generation, which drops the data-axis batch sharding
    for that call) + resumable checkpoint."""
    dm = _DataModule([_batch(8), _batch(8)])
    trainer = Trainer(
        task=_tiny_dit_task(), optimizer=optax.adamw(1e-4),
        max_epochs=1, output_dir=str(tmp_path), sequence_parallel=8,
        progress_bar=False,
    )
    assert trainer.mesh.shape == {"data": 1, "sp": 8}
    state = trainer.fit(dm)
    assert np.isfinite(trainer.best_val_loss)
    assert (tmp_path / "checkpoints" / "last").exists()
    wavs = list((tmp_path / "val_audio").glob("*.wav"))
    assert wavs, "validation sample not generated under sp"


def test_sp_disabled_fallbacks(tmp_path, capsys):
    """Non-dividing sp size and attention-core-less nets fall back to DP."""
    t1 = Trainer(
        task=_tiny_dit_task(), optimizer=optax.adamw(1e-4),
        output_dir=str(tmp_path), sequence_parallel=3,
    )
    assert t1.sequence_parallel == 0
    assert "sp" not in t1.mesh.shape

    from audiodiffuser_tpu.models.wavenet import WaveNetNoise

    task = _tiny_dit_task()
    task.net = WaveNetNoise(residual_channels=8, residual_layers=2, dilation_cycle=1)
    t2 = Trainer(
        task=task, optimizer=optax.adamw(1e-4),
        output_dir=str(tmp_path), sequence_parallel=4,
    )
    assert t2.sequence_parallel == 0
    out = capsys.readouterr().out
    assert "disabling" in out
