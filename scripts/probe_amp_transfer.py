#!/usr/bin/env python
"""Amplitude-transfer probe for a trained complex-STFT diffusion checkpoint.

Measures the denoiser's magnitude calibration directly, without running a
sampler: take real clips, corrupt their compressed specs at a grid of sigma,
denoise once, and report the per-frequency-band magnitude ratio |x_hat|/|x|.
A well-calibrated score model has ratio ~1 everywhere; a systematic
undershoot at high-energy (low-frequency) rows is amplified ~1/exponent-fold
by ``spec_back``'s power expansion and shows up in generated audio as a
low-band energy deficit (observed in logs/soak_r03).

Compares raw checkpoint params vs an EMA/phEMA reconstruction when given.

Usage:
  python scripts/probe_amp_transfer.py --ckpt CKPT_DIR [--phema RECON_DIR]
      --data-dir DIR [--experiment sc09/diffunet_complex_sc09_phema]
"""
import argparse
import glob
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

ROOT = Path(__file__).parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--phema", default=None)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--experiment", default="sc09/diffunet_complex_sc09_phema")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument(
        "--sigmas", default="0.02,0.05,0.1,0.2,0.5,1.0",
        help="comma-separated corruption levels",
    )
    ap.add_argument("--low-rows", type=int, default=40,
                    help="rows counted as the low-frequency band")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from audiodiffuser_tpu.config import compose, instantiate
    from audiodiffuser_tpu.data.sc09 import load_wav
    from train import build_trainer_and_task

    cfg = compose(
        str(ROOT / "configs"),
        "train",
        [
            f"experiment={args.experiment}",
            f"data.data_dir={args.data_dir}",
            "paths.output_dir=/tmp/probe_amp",
        ],
    )
    trainer, task, _ = build_trainer_and_task(cfg, Path("/tmp/probe_amp"))
    datamodule = instantiate(cfg.data)
    first = next(iter(datamodule.test_dataloader()))
    state = trainer.init_state(first)
    state = trainer.restore_checkpoint(args.ckpt, state)

    param_sets = {"raw": state.params}
    if args.phema:
        param_sets["phema"] = trainer.load_ema_params(args.phema, state.params)

    # real clips, one batch
    files = sorted(glob.glob(f"{args.data_dir}/train/*.wav"))
    rng = np.random.default_rng(0)
    files = list(rng.choice(files, args.batch, replace=False))
    # crop/pad to the training segment length ((num_frames-1)*hop, the
    # collator's convention) so the spec has the UNet's expected frame count
    seg = (task.generated_frame_length - 1) * task.hop_length
    auds = []
    for f in files:
        sr, a = load_wav(f)
        a = np.asarray(a, np.float32)
        if np.abs(a).max() > 10:
            a = a / 32768.0
        a = a[:seg]
        a = np.pad(a, (0, max(0, seg - len(a))))
        auds.append(a)
    audio = jnp.asarray(np.stack(auds))
    z = task.audio_to_spec(audio)  # [B, F, T, 2]
    classes = jnp.zeros((z.shape[0],), jnp.int32)

    zmag = jnp.sqrt(z[..., 0] ** 2 + z[..., 1] ** 2)
    low = args.low_rows
    key = jax.random.key(0)

    def transfer(params, sigma):
        net_fn = task._net_fn(params, train=False)
        eps = jax.random.normal(key, z.shape, z.dtype)
        x_noisy = z + sigma * eps
        xhat = task.diffusion.denoise_fn(
            x_noisy, net_fn, inference=True, cond_scale=1.0,
            sigma=sigma, classes=classes,
        )
        hmag = jnp.sqrt(xhat[..., 0] ** 2 + xhat[..., 1] ** 2)
        r_low = float(jnp.sum(hmag[:, :low]) / jnp.sum(zmag[:, :low]))
        r_high = float(jnp.sum(hmag[:, low:]) / jnp.sum(zmag[:, low:]))
        # correlation of magnitudes in the low band (structure, not just scale)
        a = np.asarray(hmag[:, :low]).ravel()
        b = np.asarray(zmag[:, :low]).ravel()
        corr = float(np.corrcoef(a, b)[0, 1])
        return r_low, r_high, corr

    jfer = jax.jit(transfer, static_argnums=())
    print(f"{'params':8s} {'sigma':>6s} {'low |x̂|/|x|':>12s} {'high':>8s} {'low corr':>9s}")
    for name, params in param_sets.items():
        for s in [float(x) for x in args.sigmas.split(",")]:
            r_low, r_high, corr = transfer(params, s)
            print(f"{name:8s} {s:6.3f} {r_low:12.4f} {r_high:8.4f} {corr:9.4f}")


if __name__ == "__main__":
    main()
