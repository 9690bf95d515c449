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


def test_resize_bmp_real_roundtrip():
    from sapray.multimodal import decode_bmp, make_bmp, resize_bmp

    src = make_bmp(40, 30, seed=9)
    out = resize_bmp(src, 16, 12)
    d = decode_bmp(out)
    assert (d["width"], d["height"]) == (16, 12)
    # nearest-neighbor: corner pixel survives exactly
    import numpy as np, struct
    def px(payload, x, y):
        off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        row = ((3 * w + 3) // 4) * 4
        b = np.frombuffer(payload, np.uint8, offset=off, count=row * abs(h))
        return tuple(b.reshape(abs(h), row)[y, 3 * x : 3 * x + 3])
    assert px(out, 0, 0) == px(src, 0, 0)


def test_sample_frames_rawv():
    from sapray.multimodal import make_rawv, sample_frames

    v = make_rawv(n_frames=10, width=8, height=6, seed=2)
    frames = sample_frames(v, every_k=4)
    assert len(frames) == 3  # frames 0, 4, 8
    assert all(len(f) == 48 for f in frames)
    with pytest.raises(ValueError, match="RAWV"):
        sample_frames(b"nope", 2)


def test_media_transformer_stage(ray_session):
    from sapray.multimodal import MediaTransformer, make_bmp, make_rawv
    import pyarrow as pa

    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "content_type": pa.array(["image/bmp", "video/rawv", "audio/wav"]),
            "payload": pa.array(
                [make_bmp(20, 20, 1), make_rawv(8, 4, 4, 2), b"RIFFxxxxWAVE"],
                pa.binary(),
            ),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(MediaTransformer, batch_format="pyarrow",
                     batch_size=2, concurrency=(1, 2))
        .to_pandas()
    )
    kinds = out.groupby("kind").size().to_dict()
    assert kinds == {"thumbnail": 1, "frame": 2, "passthrough": 1}
