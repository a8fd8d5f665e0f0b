"""End-to-end enhancement serving: tiny enhancement train -> enhance.py CLI
denoises wav files from a directory."""

import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

from audiodiffuser_tpu.data.sc09 import save_wav

TINY = [
    "trainer.min_epochs=1",
    "trainer.max_epochs=1",
    "data.batch_size=4",
    "data.num_frames=32",
    "model.net.dim=8",
    "model.net.dim_mults=[1,2]",
    "+model.net.layer_attns=False",
    "+model.net.layer_cross_attns=False",
    "+model.net.attend_at_middle=False",
    "model.generated_frame_length=32",
    "model.sampler.num_steps=3",
    "model.noise_scheduler.num_steps=3",
]


@pytest.fixture(scope="module")
def sc09_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sc09")
    rng = np.random.default_rng(0)
    for split in ("train", "valid", "test"):
        d = root / split
        d.mkdir()
        for i, name in enumerate(["Zero", "One", "Two", "Three"]):
            save_wav(
                str(d / f"{name}_{i}.wav"),
                (rng.standard_normal(16000) * 0.1).astype(np.float32),
                16000,
            )
    return root


def test_train_then_enhance_cli(sc09_dir, tmp_path):
    from train import main as train_main
    from enhance import main as enhance_main

    run = tmp_path / "run"
    train_main(
        [
            "experiment=sc09/enhunet_sc09",
            f"data.data_dir={sc09_dir}",
            f"paths.output_dir={run}",
            *TINY,
        ]
    )
    assert (run / "checkpoints" / "last").exists()

    noisy = tmp_path / "noisy"
    noisy.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        save_wav(
            str(noisy / f"mix_{i}.wav"),
            (rng.standard_normal(3968) * 0.1).astype(np.float32),
            16000,
        )

    out = tmp_path / "served"
    metrics = enhance_main(
        [
            "experiment=sc09/enhunet_sc09",
            f"ckpt_path={run}/checkpoints/last",
            f"input_dir={noisy}",
            f"paths.output_dir={out}",
            "batch_size=2",  # 3 files -> exercises the padded tail chunk
            *TINY,
        ]
    )
    wavs = sorted((out / "enhanced").glob("*_enhanced.wav"))
    assert [w.name for w in wavs] == [
        "mix_0_enhanced.wav",
        "mix_1_enhanced.wav",
        "mix_2_enhanced.wav",
    ]
    assert metrics["files_per_sec"] > 0
