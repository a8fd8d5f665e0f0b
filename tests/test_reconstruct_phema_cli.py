"""End-to-end test of the post-hoc EMA reconstruction CLI over orbax
snapshots (scripts/reconstruct_phema.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))


def test_reconstruct_phema_cli(tmp_path):
    import orbax.checkpoint as ocp

    from reconstruct_phema import list_input_snapshots, main

    ckpt = ocp.PyTreeCheckpointer()
    snaps = tmp_path / "snaps"
    for step in (1000, 2000, 3000):
        for std in (0.050, 0.100):
            tree = {"w": np.full((4,), step / 1000.0, np.float16)}
            ckpt.save(str(snaps / f"ema_prof-{std:.3f}_{step}"), tree, force=True)

    entries = list_input_snapshots(snaps)
    assert len(entries) == 6
    assert entries[0][:2] == (1000, 0.050)

    main(["--indir", str(snaps), "--outstd", "0.150,0.075"])

    for std in ("0.150", "0.075"):
        out = ckpt.restore(str((snaps / f"recon_phema-{std}_3000").absolute()))
        w = np.asarray(out["w"], np.float64)
        # a plausible mixture near the last-step value
        assert np.isfinite(w).all()
        assert 1.0 < w.mean() < 4.5


def test_reconstruct_phema_cli_empty_dir(tmp_path):
    from reconstruct_phema import main

    with pytest.raises(SystemExit):
        main(["--indir", str(tmp_path), "--outstd", "0.15"])
