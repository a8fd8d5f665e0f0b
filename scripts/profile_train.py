"""Per-op profile of the flagship TRAINING step on the attached TPU chip
(round-3 verdict item 6: generation got a kernel-by-kernel accounting,
training sat at ~45% MFU with none).

Builds the flagship task + Trainer exactly as ``experiment=sc09/
diffunet_complex_sc09_phema`` does (adamw + PowerFunctionEMA), compiles the
full ``_train_step`` (loss + grads + optimizer + EMA) at ``--batch`` rows,
then captures a jax.profiler trace and prints the top HLO ops by self time
plus a category rollup (conv/matmul vs elementwise vs reduce vs copy).

Usage: python scripts/profile_train.py [--batch 32] [--steps 3]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def build_trainer():
    import dataclasses

    import optax

    import __graft_entry__ as ge
    from audiodiffuser_tpu.training.trainer import Trainer

    # PowerFunctionEMA in-step, as the phema experiment trains
    task = dataclasses.replace(
        ge._flagship_task(tiny=False), use_ema=True, use_phema=True
    )
    return Trainer(
        task=task,
        optimizer=optax.adamw(4e-5),
        output_dir="/tmp/adt_profile_train_out",
    )


def capture(batch: int, steps: int, trace_dir: str) -> float:
    trainer = build_trainer()
    task = trainer.task
    rng = np.random.default_rng(0)
    example = {
        "audio": rng.standard_normal(
            (batch, (task.generated_frame_length - 1) * task.hop_length)
        ).astype(np.float32),
        "label": (np.arange(batch) % 10).astype(np.int32),
    }
    state = trainer.init_state(example)
    trainer._compile()
    from audiodiffuser_tpu.parallel.mesh import shard_batch

    sharded = shard_batch(trainer.mesh, example) if trainer.mesh else example
    key = jax.random.key(1)

    t0 = time.perf_counter()
    state, metrics = trainer._compiled_train_step(state, sharded, key)
    float(jax.device_get(metrics["train/loss"]))
    print(f"# first step (incl. compile wait): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # timed (for items/s context)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = trainer._compiled_train_step(
            state, sharded, jax.random.fold_in(key, i)
        )
    float(jax.device_get(metrics["train/loss"]))
    dt = (time.perf_counter() - t0) / steps
    print(f"# steady train step: {dt * 1e3:.1f} ms = {batch / dt:.1f} items/s",
          file=sys.stderr)

    with jax.profiler.trace(trace_dir):
        state, metrics = trainer._compiled_train_step(
            state, sharded, jax.random.fold_in(key, 999)
        )
        float(jax.device_get(metrics["train/loss"]))
    return batch / dt


CATEGORIES = (
    ("convolution", "conv/matmul"),
    ("dot", "conv/matmul"),
    ("loop fusion", "elementwise fusion"),
    ("input fusion", "reduce fusion"),
    ("output fusion", "reduce fusion"),
    ("reduce", "reduce fusion"),
    ("copy", "copy/layout"),
    ("transpose", "copy/layout"),
    ("all-reduce", "collective"),
    ("rng", "rng"),
)


def report(trace_dir: str, top: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    parsed = json.loads(data)
    cols = [c.get("label") or c.get("id") for c in parsed["cols"]]
    rows = [
        dict(zip(cols, [c.get("v") if c else None for c in r["c"]]))
        for r in parsed["rows"]
    ]
    tkeys = [k for k in rows[0]
             if k and "self" in k.lower() and "time" in k.lower()]
    tkey = tkeys[0]
    ckeys = [k for k in rows[0] if k and "category" in k.lower()]
    ckey = ckeys[0] if ckeys else None
    rows.sort(key=lambda r: -(r.get(tkey) or 0))

    total = sum(r.get(tkey) or 0 for r in rows)
    by_cat = {}
    for r in rows:
        raw = (r.get(ckey) or "other") if ckey else "other"
        label = next((lbl for pat, lbl in CATEGORIES if pat in str(raw)), str(raw))
        by_cat[label] = by_cat.get(label, 0) + (r.get(tkey) or 0)
    print("== category rollup (self time) ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {t / total * 100:5.1f}%")
    print(f"== top {top} ops ==")
    for r in rows[:top]:
        name = r.get("HLO op name") or r.get("hlo_op_name") or "?"
        cat = (r.get(ckey) or "") if ckey else ""
        print(f"  {(r.get(tkey) or 0) / total * 100:5.1f}%  {cat:28s} {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/adt_profile_train")
    ap.add_argument("--reuse", action="store_true")
    args = ap.parse_args()
    if not args.reuse:
        capture(args.batch, args.steps, args.trace_dir)
    report(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
