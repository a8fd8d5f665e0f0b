"""Worker for the true 2-process distributed test (tests/test_multiprocess.py).

Reference capability being matched: the PyTorch reference actually *executes*
2 training processes in CI via Lightning ``ddp_spawn`` on CPU
(``tests/test_train.py:52-61``). The JAX equivalent is one OS process per
"host", each owning a disjoint slice of CPU devices, joined into a single
global mesh by ``jax.distributed.initialize`` (Gloo collectives on CPU).

Run with ``--procid {0,1}`` for the 2-process run, or ``--procid -1`` for the
single-process 8-device reference run used for loss parity.

What it records into ``<out>/proc<id>.json``:
  - process/device topology seen by this process
  - the train-loader file shard (data/sc09.py setup(): per-process sharding)
  - global-batch assembly: shapes + one fixed-batch train-step loss/param
    checksum (parallel/mesh.py shard_batch 'process_count>1' branch)
  - a full ``Trainer.fit`` epoch (shared output dir; rank-0-only writes)
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[2]))


def build_task():
    # tiny waveform task (mirrors tests/test_ckpt_restore.py)
    from audiodiffuser_tpu.diffusion import EluDiffusion
    from audiodiffuser_tpu.models.unet1d import UNet1dBase
    from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
    from audiodiffuser_tpu.ops.schedules import KarrasSchedule
    from audiodiffuser_tpu.samplers.edm import EDMSampler
    from audiodiffuser_tpu.tasks.waveform_task import DiffusionWaveformTask

    net = UNet1dBase(
        channels=16,
        class_cond=False,
        num_filters=16,
        window_length=4,
        stride=2,
        in_channels=1,
        multipliers=[1, 2],
        factors=[2],
        num_blocks=[1],
        attentions=[False],
        attention_heads=2,
        attention_multiplier=2,
        resnet_groups=8,
        kernel_multiplier_downsample=2,
        use_nearest_upsample=False,
        use_skip_scale=True,
        use_attention_bottleneck=False,
    )
    return DiffusionWaveformTask(
        net=net,
        diffusion=EluDiffusion(sigma_data=0.3),
        sampler=EDMSampler(s_churn=0.0, num_steps=2, use_heun=False),
        noise_scheduler=KarrasSchedule(0.01, 10.0, num_steps=2),
        noise_distribution=LogNormalDistribution(-1.2, 1.2),
        generated_sample_length=64,
        generated_sample_class=1,
        use_ema=False,
        use_phema=False,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    multi = args.procid >= 0
    jax.config.update("jax_num_cpu_devices", 8 // args.nprocs if multi else 8)
    if multi:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.procid,
            # an oversubscribed CI box can skew the workers by minutes
            # (XLA:CPU compiles on a shared core); don't let liveness
            # heuristics kill a straggler
            heartbeat_timeout_seconds=300,
            shutdown_timeout_seconds=1200,
        )

    def barrier(name: str, timeout_ms: int = 1_200_000):
        """Coordination-service barrier (NOT a gloo collective).

        Every gloo collective tolerates only ~30 s of inter-worker skew
        (hardcoded KV timeout in XLA's gloo context rendezvous + op
        timeouts), while an XLA:CPU compile on a loaded box can skew the
        workers by minutes. The pattern throughout this worker is:
        compile LOCALLY first (AOT .lower().compile()), then rendezvous
        here with a generous timeout, then execute the collective-bearing
        program in lockstep.
        """
        if multi:
            from jax._src import distributed

            distributed.global_state.client.wait_at_barrier(name, timeout_ms)

    if multi:
        barrier("worker-start")
        # establish the gloo context at near-zero skew (its rendezvous has
        # the 30 s KV timeout; nothing heavy has run yet on either worker)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gloo-ctx")

    import optax

    from audiodiffuser_tpu.data.sc09 import SC09DataModule
    from audiodiffuser_tpu.parallel.mesh import is_main_process, shard_batch
    from audiodiffuser_tpu.training.logging import CSVLogger
    from audiodiffuser_tpu.training.trainer import Trainer

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    res = {
        "procid": args.procid,
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "is_main": bool(is_main_process()),
    }

    # ---- (a) per-process loader file sharding (data/sc09.py:234) ----------
    global_batch = 8
    dm = SC09DataModule(
        args.data,
        batch_size=global_batch // jax.process_count(),
        num_frames=17,
        hop_length=4,  # audio_len 64
        seed=0,
    )
    loader = dm.train_dataloader()
    res["loader"] = {
        "num_shards": loader.num_shards,
        "shard_index": loader.shard_index,
        "dataset_len": len(loader.dataset),
        # dir-qualified: the train split spans train/ AND valid/, whose
        # basenames collide (train/One_0.wav vs valid/One_0.wav)
        "shard_files": sorted(
            "/".join(Path(loader.dataset.filenames[int(i)]).parts[-2:])
            for i in loader._indices()
        ),
    }

    # ---- (b) fixed-global-batch train step: assembly + loss parity --------
    rng = np.random.default_rng(7)
    audio_g = (rng.standard_normal((global_batch, 64)) * 0.1).astype(np.float32)
    label_g = np.zeros((global_batch,), np.int32)
    if multi:
        per = global_batch // args.nprocs
        lo = args.procid * per
        local = {"audio": audio_g[lo : lo + per], "label": label_g[lo : lo + per]}
    else:
        local = {"audio": audio_g, "label": label_g}

    trainer = Trainer(
        task=build_task(),
        optimizer=optax.adamw(1e-3),
        output_dir=str(out / f"steponly_{args.procid}"),
        progress_bar=False,
        seed=0,
    )
    state = trainer.init_state({"audio": audio_g[:1], "label": label_g[:1]})
    trainer._compile()
    sharded = shard_batch(trainer.mesh, local)
    res["global_batch_shape"] = list(sharded["audio"].shape)
    # compile locally (no communication), THEN rendezvous, THEN execute —
    # see barrier()'s docstring; the executable also lands in the shared
    # persistent compile cache, so the re-trace in the call below is cheap
    trainer._compiled_train_step.lower(state, sharded, jax.random.key(123)).compile()
    barrier("steponly-compiled")
    state2, metrics = trainer._compiled_train_step(
        state, sharded, jax.random.key(123)
    )
    res["step_loss"] = float(jax.device_get(metrics["train/loss"]))
    res["param_checksum"] = float(
        sum(
            float(np.abs(np.asarray(jax.device_get(p))).sum())
            for p in jax.tree.leaves(state2.params)
        )
    )

    # ---- (c) full Trainer.fit epoch into a SHARED output dir --------------
    fit_trainer = Trainer(
        task=build_task(),
        optimizer=optax.adamw(1e-3),
        output_dir=str(out / "fit"),  # shared: rank-0-only writes
        # every process constructs the logger; the trainer gates log_metrics
        # behind is_main_process() — exactly what the test asserts
        logger=CSVLogger(str(out / "fit")),
        log_every_n_steps=1,
        progress_bar=False,
        seed=0,
        max_epochs=1,
        min_epochs=1,
        # validation would compile _val_step AND the sampler scan — minutes
        # of XLA:CPU compile that add nothing to the multi-process assertions
        check_val_every_n_epoch=2,
    )
    # warm fit's train-step jit (same shapes as the loader batches) before
    # entering fit, so its first step doesn't open a minutes-long compile
    # window between the workers right before a gloo collective
    first = next(iter(dm.train_dataloader()))
    fit_trainer._fit_mesh_to_batch(first["audio"].shape[0] * jax.process_count())
    fit_state = fit_trainer.init_state(first)
    fit_trainer._compile()
    warm_batch = shard_batch(fit_trainer.mesh, first)
    fit_trainer._compiled_train_step.lower(
        fit_state, warm_batch, jax.random.key(0)
    ).compile()
    barrier("fit-compiled")
    final = fit_trainer.fit(dm, state=fit_state)
    res["fit_steps"] = int(jax.device_get(final.step))

    (out / f"proc{args.procid}.json").write_text(json.dumps(res, indent=2))
    print(f"worker {args.procid} done: {res['fit_steps']} fit steps")

    # rendezvous before interpreter exit: on an oversubscribed CPU the fast
    # process otherwise reaches the coordination-service shutdown barrier
    # minutes before the slow one; coordination barrier, NOT a gloo sync
    barrier("worker-exit")


if __name__ == "__main__":
    main()
