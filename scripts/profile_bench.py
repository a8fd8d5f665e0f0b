"""Per-op profile of the headline bench workload (flagship UNet, 32-step
Heun sampling) on the attached TPU chip.

Captures a jax.profiler trace around the compiled sample step, then parses
the xplane with xprof's converter and prints the top HLO ops by self time —
the ground truth for where generation wall-clock goes.

Usage: python scripts/profile_bench.py [--batch 64] [--tool hlo_stats]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def capture(batch: int, trace_dir: str) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    task = bench.build_task()
    classes = jnp.arange(batch, dtype=jnp.int32) % 10
    x0 = jnp.zeros((1, 256, 128, 2))
    params = task.net.init(
        jax.random.key(0), x0, jnp.zeros((1,)), classes=classes[:1]
    )["params"]
    from audiodiffuser_tpu.ops.quant import int8_enabled

    if int8_enabled():
        # profile the actual bench configuration: static calibrated scales
        # (the dynamic-quant variant has extra absmax/requant passes that
        # static mode fuses away — see PROFILE.md)
        task.calibrate_int8_scales(params, jax.random.key(7))
    sample_fn = jax.jit(task.make_sample_fn())
    key = jax.random.key(1)
    compiled = sample_fn.lower(params, key, classes).compile()
    float(jnp.sum(compiled(params, key, classes)))  # warm
    with jax.profiler.trace(trace_dir):
        out = compiled(params, jax.random.fold_in(key, 1), classes)
        float(jnp.sum(out))


def report(trace_dir: str, tool: str, top: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    rows = None
    try:
        parsed = json.loads(data)
        # gviz DataTable format: {cols: [...], rows: [{c: [{v: ...}, ...]}]}
        if isinstance(parsed, dict) and "rows" in parsed:
            cols = [c.get("label") or c.get("id") for c in parsed["cols"]]
            rows = [
                dict(zip(cols, [c.get("v") if c else None for c in r["c"]]))
                for r in parsed["rows"]
            ]
    except (json.JSONDecodeError, KeyError, TypeError):
        pass
    if rows is None:
        print(data[:8000])
        return
    # sort by the first column that looks like a self-time total
    time_keys = [
        k
        for k in rows[0]
        if k and ("self" in k.lower() or "total" in k.lower()) and "time" in k.lower()
    ]
    key = time_keys[0] if time_keys else None
    if key:
        rows.sort(key=lambda r: -(r.get(key) or 0))
    for r in rows[:top]:
        print(json.dumps(r)[:400])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tool", default="framework_op_stats")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/adt_profile")
    ap.add_argument("--reuse", action="store_true", help="skip capture")
    args = ap.parse_args()
    if not args.reuse:
        capture(args.batch, args.trace_dir)
    report(args.trace_dir, args.tool, args.top)


if __name__ == "__main__":
    main()
