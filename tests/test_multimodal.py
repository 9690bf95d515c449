"""Multimodal decode tests: real BMP/WAV byte parsing + stage plumbing."""

import numpy as np
import pytest

import ray.data

from sapray.multimodal import (
    decode_bmp,
    decode_wav,
    default_decode,
    extract_media_features,
    make_bmp,
    make_wav,
    synth_media_table,
)


def test_bmp_roundtrip():
    payload = make_bmp(320, 200, seed=3)
    d = decode_bmp(payload)
    assert (d["width"], d["height"]) == (320, 200)
    assert d["sample_rate"] is None
    assert abs(float(np.sum(d["feature"])) - 1.0) < 1e-6
    with pytest.raises(ValueError, match="BM"):
        decode_bmp(b"\x00\x01rubbish")


def test_wav_roundtrip():
    payload = make_wav(22050, 500, channels=2, seed=5)
    d = decode_wav(payload)
    assert (d["sample_rate"], d["n_samples"]) == (22050, 500)
    assert d["width"] is None
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")


def test_default_decode_dispatch_and_stub():
    bmp = make_bmp(10, 10, 1)
    assert default_decode(bmp, "image/bmp")["width"] == 10
    # unknown type -> deterministic stub
    d = default_decode(b"\x00" * 100, "video/mp4")
    assert d["width"] == 64 + 100 % 512


def test_extract_media_features_pipeline(ray_session):
    ds = ray.data.from_arrow(synth_media_table(16))
    out = extract_media_features(ds, batch_size=4, concurrency=2).to_pandas()
    assert len(out) == 16
    bmp = out[out["content_type"] == "image/bmp"]
    wav = out[out["content_type"] == "audio/wav"]
    # header formulas round-trip through real byte parsing
    assert (bmp["width"] == 8 + bmp["media_id"] % 32).all()
    assert (wav["n_samples"] == 64 + 10 * wav["media_id"]).all()
    assert bmp["sample_rate"].isna().all() and wav["width"].isna().all()
