"""Export frozen codec parameters from a CodecTask training checkpoint.

Takes a Trainer checkpoint (the orbax tree saved by
``training.trainer.Trainer.save_checkpoint``: step/params/opt_state/...)
and writes just the ``params`` subtree to a new orbax directory, in the
format ``tasks.latent_task.DiffusionLatentTask`` consumes via
``codec_ckpt_path`` (reference workflow: descript-audio-codec pretrained
weights feeding latent diffusion; here the codec is trained in-framework).

Usage:
    python scripts/export_codec_params.py \
        --ckpt outputs/codec_run/checkpoints/last --out outputs/codec_params

Optionally ``--use-ema`` exports the EMA parameters instead (when the codec
run tracked a traditional EMA whose state is an (params, ...) tree holding
averaged parameters under 'params').
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="Trainer checkpoint dir")
    ap.add_argument("--out", required=True, help="output orbax dir for params")
    ap.add_argument(
        "--use-ema",
        action="store_true",
        help="export EMA-averaged params when the checkpoint has them",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    payload = ckpt.restore(str(Path(args.ckpt).absolute()))
    params = payload["params"]
    if args.use_ema:
        ema = payload.get("ema_state")
        if ema is None:
            raise SystemExit("checkpoint has no ema_state; drop --use-ema")
        # EMA states store averaged params under a 'params'-shaped subtree;
        # fall back to the raw state when the structure already matches.
        params = ema.get("params", ema) if isinstance(ema, dict) else ema

    out = Path(args.out).absolute()
    ckpt.save(str(out), params, force=True)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"exported {n:,} codec params -> {out}")


if __name__ == "__main__":
    main()
