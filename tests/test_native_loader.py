"""Native WAV decoder tests: build, decode parity vs scipy, batch loading."""

import numpy as np
import pytest

from audiodiffuser_tpu.data import native_loader
from audiodiffuser_tpu.data.sc09 import (
    Collator,
    DataLoader,
    SC09Dataset,
    load_wav,
    save_wav,
)

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    for i, name in enumerate(["Zero", "One", "Two"]):
        audio = (rng.standard_normal(5000) * 0.2).astype(np.float32)
        save_wav(str(d / f"{name}_{i}.wav"), audio, 16000)
    return d


def test_num_frames(wav_dir):
    path = sorted(wav_dir.glob("*.wav"))[0]
    assert native_loader.num_frames(str(path)) == 5000


def test_decode_matches_scipy(wav_dir):
    path = str(sorted(wav_dir.glob("*.wav"))[0])
    _, ref = load_wav(path)
    got = native_loader.load(path, 5000, 0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_crop_and_pad(wav_dir):
    path = str(sorted(wav_dir.glob("*.wav"))[0])
    _, ref = load_wav(path)
    # crop
    got = native_loader.load(path, 1000, 200)
    np.testing.assert_allclose(got, ref[200:1200], atol=1e-6)
    # pad beyond end
    got2 = native_loader.load(path, 6000, 0)
    np.testing.assert_allclose(got2[:5000], ref, atol=1e-6)
    assert np.all(got2[5000:] == 0)


def test_batch_load(wav_dir):
    paths = [str(p) for p in sorted(wav_dir.glob("*.wav"))]
    out = native_loader.load_batch(paths, 4000, [0, 100, 500])
    assert out.shape == (3, 4000)
    _, ref1 = load_wav(paths[1])
    np.testing.assert_allclose(out[1], ref1[100:4100], atol=1e-6)


def test_dataloader_uses_native_path(wav_dir):
    ds = SC09Dataset([wav_dir])
    dl = DataLoader(ds, batch_size=3, collator=Collator(2048), shuffle=False)
    batch = next(iter(dl))
    assert batch["audio"].shape == (3, 2048)
    assert batch["audio"].dtype == np.float32
    assert set(batch["label"].tolist()) == {0, 1, 2}


def test_int16_wire_format_exact(wav_dir):
    """wire_dtype="int16" ships PCM ints whose device-side rescale is
    bit-identical (within one rounding ulp) to the float32 pipeline."""
    ds = SC09Dataset([wav_dir])
    f32 = next(iter(DataLoader(ds, batch_size=3, collator=Collator(2048), shuffle=False)))
    i16 = next(iter(DataLoader(ds, batch_size=3, collator=Collator(2048), shuffle=False, wire_dtype="int16")))
    assert i16["audio"].dtype == np.int16
    np.testing.assert_allclose(
        i16["audio"].astype(np.float32) / 32768.0, f32["audio"], atol=0.5 / 32768.0
    )
    np.testing.assert_array_equal(i16["label"], f32["label"])


def test_trainer_audio_to_float_helper():
    from audiodiffuser_tpu.training.trainer import _audio_to_float

    pcm = {"audio": np.array([[0, 16384, -32768]], np.int16), "label": np.array([1])}
    out = _audio_to_float(pcm)
    np.testing.assert_allclose(
        np.asarray(out["audio"]), [[0.0, 0.5, -1.0]], atol=1e-7
    )
    flt = {"audio": np.ones((1, 4), np.float32)}
    assert _audio_to_float(flt)["audio"] is flt["audio"]  # no-op passthrough
