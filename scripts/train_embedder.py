#!/usr/bin/env python
"""Train the VGGish-architecture FAD embedder as an SC09 digit classifier.

The classifier's penultimate 128-d embedding is the FAD embedding space
(the construction FID/FAD are built on; the official VGGish weights are a
YouTube-8M classifier the same way). See evaluation/embedder.py.

Usage:
    python scripts/train_embedder.py --data-dir DATA --out CKPT_DIR \
        [--epochs 20] [--batch-size 64] [--width-mult 1.0] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--width-mult", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=os.environ.get("JAX_PLATFORMS", ""))
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np
    import optax
    import orbax.checkpoint as ocp

    from audiodiffuser_tpu.data.sc09 import SC09DataModule
    from audiodiffuser_tpu.evaluation.embedder import VGGish, log_mel_patches

    dm = SC09DataModule(
        data_dir=args.data_dir, batch_size=args.batch_size, seed=args.seed
    )
    model = VGGish(num_classes=10, width_mult=args.width_mult)

    key = jax.random.key(args.seed)
    patches0 = log_mel_patches(jnp.zeros((1, 16000)))
    params = model.init(key, patches0)["params"]
    tx = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, audio, labels):
        patches = log_mel_patches(audio)

        def loss_fn(p):
            _, logits = model.apply({"params": p}, patches)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    for epoch in range(args.epochs):
        losses, accs = [], []
        for batch in dm.train_dataloader():
            params, opt_state, loss, acc = step(
                params,
                opt_state,
                jnp.asarray(batch["audio"]),
                jnp.asarray(batch["label"]),
            )
            losses.append(float(loss))
            accs.append(float(acc))
        # validation accuracy
        vaccs = []
        for batch in dm.val_dataloader():
            patches = log_mel_patches(jnp.asarray(batch["audio"]))
            _, logits = model.apply({"params": params}, patches)
            vaccs.append(float((logits.argmax(-1) == jnp.asarray(batch["label"])).mean()))
        val = f"{np.mean(vaccs):.3f}" if vaccs else "n/a"
        print(
            f"epoch {epoch}: loss {np.mean(losses):.4f} "
            f"acc {np.mean(accs):.3f} val_acc {val}",
            flush=True,
        )

    out = Path(args.out).absolute()
    ocp.PyTreeCheckpointer().save(
        str(out),
        {"params": jax.device_get(params), "width_mult": args.width_mult},
    )
    print(f"saved embedder to {out}")


if __name__ == "__main__":
    main()
