"""True multi-PROCESS distributed execution test.

The reference runs 2 actual training processes in CI (Lightning ddp_spawn x2
on CPU, ``tests/test_train.py:52-61``). Every other multi-device test in this
suite is a single-process virtual mesh; this one spawns 2 OS processes with
4 CPU devices each, joined by ``jax.distributed.initialize`` (Gloo), and
asserts the code paths that only execute when ``jax.process_count() > 1``:

  - per-process loader file sharding (``data/sc09.py`` setup())
  - global-batch assembly via ``jax.make_array_from_process_local_data``
    (``parallel/mesh.py:shard_batch``)
  - ``is_main_process()`` rank-0-only writes under a real 2-process run
  - loss parity of the jitted DP train step vs a single-process 8-device run
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parents[1]
WORKER = ROOT / "tests" / "helpers" / "multiproc_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_data(root: Path, per_class: int = 8):
    from audiodiffuser_tpu.data.sc09 import save_wav

    rng = np.random.default_rng(0)
    for split in ("train", "valid", "test"):
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        for name in ("Zero", "One", "Two", "Three"):
            for i in range(per_class):
                save_wav(
                    str(d / f"{name}_{i}.wav"),
                    (rng.standard_normal(256) * 0.1).astype(np.float32),
                    16000,
                )


def _spawn(procid, nprocs, port, data, out):
    env = dict(os.environ)
    # the workers pick their own device counts; the parent suite's virtual
    # 8-device flag must not leak into them
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # persistent compile cache: the three worker invocations share jits
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
    return subprocess.Popen(
        [
            sys.executable, str(WORKER),
            "--procid", str(procid), "--nprocs", str(nprocs),
            "--port", str(port), "--data", str(data), "--out", str(out),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        cwd=str(ROOT),
        env=env,
    )


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    data, out = tmp / "data", tmp / "out"
    _make_data(data)

    port = _free_port()
    procs = [_spawn(i, 2, port, data, out / "mp2") for i in range(2)]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    ref = _spawn(-1, 2, _free_port(), data, out / "single")
    log = ref.communicate(timeout=900)[0]
    assert ref.returncode == 0, f"single-process reference failed:\n{log[-3000:]}"

    res = {
        0: json.loads((out / "mp2" / "proc0.json").read_text()),
        1: json.loads((out / "mp2" / "proc1.json").read_text()),
        -1: json.loads((out / "single" / "proc-1.json").read_text()),
    }
    return res, out


def test_two_process_topology(mp_results):
    res, _ = mp_results
    for i in (0, 1):
        assert res[i]["process_count"] == 2
        assert res[i]["local_devices"] == 4
        assert res[i]["global_devices"] == 8
    assert res[0]["is_main"] is True
    assert res[1]["is_main"] is False
    assert res[-1]["process_count"] == 1


def test_loader_shards_are_disjoint_and_cover(mp_results):
    res, _ = mp_results
    s0 = set(res[0]["loader"]["shard_files"])
    s1 = set(res[1]["loader"]["shard_files"])
    assert res[0]["loader"]["num_shards"] == 2
    assert res[0]["loader"]["shard_index"] == 0
    assert res[1]["loader"]["shard_index"] == 1
    assert s0 and s1 and not (s0 & s1), "process shards must be disjoint"
    full = set(res[-1]["loader"]["shard_files"])
    assert res[-1]["loader"]["num_shards"] == 1
    assert s0 | s1 == full, "process shards must cover the full dataset"


def test_global_batch_assembly(mp_results):
    res, _ = mp_results
    # each process fed a (4, 64) LOCAL batch; the assembled array is GLOBAL
    assert res[0]["global_batch_shape"] == [8, 64]
    assert res[1]["global_batch_shape"] == [8, 64]
    assert res[-1]["global_batch_shape"] == [8, 64]


def test_train_step_loss_parity_vs_single_process(mp_results):
    res, _ = mp_results
    # both multi-process ranks computed the same fixed global batch with the
    # same key and same init; their jitted-step loss must agree with each
    # other bitwise and with the single-process 8-device run numerically
    assert res[0]["step_loss"] == res[1]["step_loss"]
    np.testing.assert_allclose(
        res[0]["step_loss"], res[-1]["step_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        res[0]["param_checksum"], res[-1]["param_checksum"], rtol=1e-5
    )


def test_fit_executes_and_rank_zero_only_writes(mp_results):
    res, out = mp_results
    # one epoch over 64 train files (train_dirs = train+valid), global batch
    # 8 -> 8 optimizer steps, regardless of how work splits across processes
    assert res[0]["fit_steps"] == res[1]["fit_steps"] == 8
    assert res[-1]["fit_steps"] == 8
    # the shared fit dir was written exactly once (by rank 0): checkpoints +
    # metrics csv; a double-writer would duplicate csv step rows
    fit = out / "mp2" / "fit"
    assert (fit / "checkpoints" / "last").is_dir()
    header, *rows = (fit / "csv" / "metrics.csv").read_text().strip().splitlines()
    cols = header.split(",")
    si, li = cols.index("step"), cols.index("train/loss_step")
    # per-step loss rows: exactly one per optimizer step (1..8). A rank-1
    # double-writer would emit each of them twice. (Other rows — the step-0
    # params row and the epoch-summary row at step 8 — legitimately share
    # step numbers with them.)
    step_rows = [int(float(r.split(",")[si])) for r in rows if r.split(",")[li]]
    assert sorted(step_rows) == list(range(1, 9)), step_rows
