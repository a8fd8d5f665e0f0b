"""End-to-end smoke tests: tiny train -> checkpoint -> resume -> generate,
on synthetic SC09-style data (reference tests/test_train.py intent)."""

import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

from audiodiffuser_tpu.data.sc09 import save_wav

CONFIG_DIR = str(ROOT / "configs")


@pytest.fixture(scope="module")
def sc09_dir(tmp_path_factory):
    """Synthetic SC09 layout: train/valid/test dirs with named digit wavs."""
    root = tmp_path_factory.mktemp("sc09")
    rng = np.random.default_rng(0)
    for split in ("train", "valid", "test"):
        d = root / split
        d.mkdir()
        for i, name in enumerate(["Zero", "One", "Two", "Three"]):
            audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
            save_wav(str(d / f"{name}_{i}.wav"), audio, 16000)
    return root


def _overrides(sc09_dir, tmp_path, extra=()):
    return [
        "experiment=example",
        f"paths.output_dir={tmp_path}/out",
        f"data.data_dir={sc09_dir}",
        *extra,
    ]


def test_fast_dev_run(sc09_dir, tmp_path):
    from train import main

    main(_overrides(sc09_dir, tmp_path, ["+trainer.fast_dev_run=True"]))
    out = tmp_path / "out"
    assert (out / "config.json").exists()
    assert (out / "checkpoints" / "last").exists()
    assert (out / "csv" / "metrics.csv").exists()


def test_train_generates_val_audio_and_resumes(sc09_dir, tmp_path):
    from train import main

    main(_overrides(sc09_dir, tmp_path))
    out = tmp_path / "out"
    wavs = list((out / "val_audio").glob("*.wav"))
    assert wavs, "validation should write a generated sample"
    # EMA snapshots written? (num_ema_snapshot_item default too large for the
    # tiny run; just confirm checkpoint exists and resume runs)
    assert (out / "checkpoints" / "last").exists()

    # resume from last checkpoint and train one more epoch (the epoch
    # counter is restored, so max_epochs must be extended)
    main(
        _overrides(
            sc09_dir,
            tmp_path,
            [
                f"ckpt_path={out}/checkpoints/last",
                f"paths.output_dir={tmp_path}/out2",
                "trainer.max_epochs=2",
            ],
        )
    )
    assert (tmp_path / "out2" / "checkpoints" / "last").exists()


def test_eval_from_checkpoint(sc09_dir, tmp_path):
    from train import main as train_main
    from eval import main as eval_main

    train_main(_overrides(sc09_dir, tmp_path))
    ckpt = tmp_path / "out" / "checkpoints" / "last"

    eval_main(
        [
            "experiment=example",
            f"data.data_dir={sc09_dir}",
            f"paths.output_dir={tmp_path}/eval_out",
            f"ckpt_path={ckpt}",
            "model.total_test_samples=2",
        ]
    )
    samples = list((tmp_path / "eval_out" / "test_samples").glob("*.wav"))
    assert len(samples) == 2


def test_multirun_sweep(sc09_dir, tmp_path):
    from train import main

    results = main(
        _overrides(sc09_dir, tmp_path, ["+trainer.fast_dev_run=True"])
        + ["model.optimizer.learning_rate=1e-4,1e-3", "--multirun"]
    )
    assert isinstance(results, list) and len(results) == 2


def test_generate_standalone(sc09_dir, tmp_path):
    """generate.py samples from a checkpoint without touching the dataset."""
    from train import main as train_main
    from generate import main as gen_main

    train_main(_overrides(sc09_dir, tmp_path))
    ckpt = tmp_path / "out" / "checkpoints" / "last"
    metrics = gen_main(
        [
            "experiment=example",
            f"ckpt_path={ckpt}",
            f"paths.output_dir={tmp_path}/gen",
            "num_samples=3",
            "batch_size=2",
        ]
    )
    wavs = list((tmp_path / "gen" / "samples").glob("*.wav"))
    assert len(wavs) == 3
    assert metrics["samples_per_sec"] > 0


def test_ema_snapshots_written_and_consumed(sc09_dir, tmp_path):
    """Power-function EMA snapshots are written during training and an
    ema_ckpt_path generates from the EMA weights (reference :156-167,
    :239-242)."""
    from train import main as train_main
    from eval import main as eval_main

    train_main(
        _overrides(
            sc09_dir,
            tmp_path,
            [
                "model.use_ema=True",
                "model.use_phema=True",
                "model.num_ema_snapshot_item=4",  # snapshot every 4 items
            ],
        )
    )
    out = tmp_path / "out"
    snaps = sorted((out / "ema_snapshots").glob("ema_prof-*"))
    assert snaps, "no EMA snapshots written"
    # both stds present
    assert any("-0.050_" in s.name for s in snaps)
    assert any("-0.100_" in s.name for s in snaps)

    eval_main(
        [
            "experiment=example",
            f"data.data_dir={sc09_dir}",
            f"paths.output_dir={tmp_path}/ema_eval",
            f"ckpt_path={out}/checkpoints/last",
            f"model.ema_ckpt_path={snaps[0]}",
            "model.total_test_samples=2",
            "model.use_ema=True",
            "model.use_phema=True",
        ]
    )
    wavs = list((tmp_path / "ema_eval" / "test_samples").glob("*.wav"))
    assert len(wavs) == 2


def test_full_phema_lifecycle(sc09_dir, tmp_path):
    """train (phema snapshots) -> reconstruct_phema CLI -> generate from the
    reconstructed EMA weights: the complete post-hoc EMA workflow."""
    sys.path.insert(0, str(ROOT / "scripts"))
    from train import main as train_main
    from generate import main as gen_main
    from reconstruct_phema import main as recon_main

    train_main(
        _overrides(
            sc09_dir,
            tmp_path,
            [
                "model.use_ema=True",
                "model.use_phema=True",
                "model.num_ema_snapshot_item=4",
            ],
        )
    )
    out = tmp_path / "out"
    snaps = out / "ema_snapshots"
    assert list(snaps.glob("ema_prof-*"))

    recon_main(["--indir", str(snaps), "--outstd", "0.150"])
    recon = sorted(snaps.glob("recon_phema-0.150_*"))
    assert recon, "reconstruction output missing"

    gen_main(
        [
            "experiment=example",
            f"ckpt_path={out}/checkpoints/last",
            f"model.ema_ckpt_path={recon[0]}",
            f"paths.output_dir={tmp_path}/phema_gen",
            "num_samples=2",
            "batch_size=2",
            "model.use_ema=True",
            "model.use_phema=True",
        ]
    )
    wavs = list((tmp_path / "phema_gen" / "samples").glob("*.wav"))
    assert len(wavs) == 2
