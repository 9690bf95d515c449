"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata — exactly the
reference's stream-property model (etag/content-type/read-link,
``reference src/main/java/io/cdap/plugin/sap/odata/StreamProperty.java:32-52``)
generalized to inline payloads. Decode / feature-extract stages are
actor-pool ``map_batches`` classes whose Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested; the
codec call itself is stubbed (pillow/librosa/ffmpeg are not in this
container) behind ``decode_fn`` — inject a real decoder, or use the
deterministic fake for tests.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("content_type", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("etag", pa.string()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("content_type", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("feature", pa.list_(pa.float32())),
    ]
)


def _stub_decode(payload: bytes, content_type: str) -> dict:
    """Real decoder goes here (PIL.Image.open / soundfile / pyav).

    The deterministic fake derives stable pseudo-dimensions and a
    16-dim byte-histogram feature from the payload so the full pipeline
    (schema, batching, actor lifecycle) is exercised end-to-end.
    """
    if payload is None:
        raise NotImplementedError("media decode requires a payload")
    b = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(b >> 4, minlength=16).astype(np.float32)
    total = hist.sum() or 1.0
    return {
        "width": int(64 + (len(b) % 512)),
        "height": int(64 + ((len(b) // 7) % 512)),
        "feature": (hist / total),
    }


class MediaFeatureExtractor:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` loads the (possibly heavy) decoder once per actor; use
    small ``batch_size`` for large payloads so batch x concurrency fits
    worker heap (SURVEY.md §7.4 "very wide rows").
    """

    def __init__(self, decode_fn: Callable[[bytes, str], dict] | None = None):
        self.decode = decode_fn or _stub_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        ctypes = batch.column("content_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {"media_id": [], "content_type": [], "n_bytes": [],
                "width": [], "height": [], "feature": []}
        for mid, ct, p in zip(ids, ctypes, payloads):
            d = self.decode(p, ct)
            rows["media_id"].append(mid)
            rows["content_type"].append(ct)
            rows["n_bytes"].append(len(p))
            rows["width"].append(d["width"])
            rows["height"].append(d["height"])
            rows["feature"].append(d["feature"])
        return pa.table(
            {
                "media_id": pa.array(rows["media_id"], pa.int64()),
                "content_type": pa.array(rows["content_type"], pa.string()),
                "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "feature": pa.array(
                    [np.asarray(f, dtype=np.float32) for f in rows["feature"]],
                    pa.list_(pa.float32()),
                ),
            }
        )


def extract_media_features(
    ds: ray.data.Dataset,
    decode_fn: Callable | None = None,
    batch_size: int = 256,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Media feature pipeline: small batches (payloads are wide), actor
    pool sized explicitly, Arrow in/out."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_fn": decode_fn},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for tests (opaque binary payloads)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(64 + 100 * i), dtype=np.uint8).tobytes() for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "content_type": pa.array(
                ["image/jpeg" if i % 2 == 0 else "audio/wav" for i in range(n)]
            ),
            "payload": pa.array(payloads, pa.binary()),
            "etag": pa.array([f'W/"{i}"' for i in range(n)]),
        }
    )
