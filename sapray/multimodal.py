"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata — the
reference's stream-property model (etag/content-type/read-link,
``reference src/main/java/io/cdap/plugin/sap/odata/StreamProperty.java:32-52``)
generalized to inline payloads. Decode / feature-extract stages are
actor-pool ``map_batches`` classes.

Two REAL pure-numpy decoders are built in — BMP (BITMAPINFOHEADER
24-bit) and WAV (RIFF/PCM) header+payload parsing — so the decode path
is exercised against genuine format bytes without any codec library.
Other content types fall through to ``decode_fn`` (inject pillow /
soundfile / pyav there) or the deterministic ``_stub_decode`` fake.
The synthetic corpus emits real BMP/WAV files whose header fields are
integer formulas of ``media_id``, making the full decode round-trip
SQL-predictable (the oracle recomputes the formulas; the engine must
actually parse the bytes to match).
"""

from __future__ import annotations

import struct
from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray.data

from sapray.stage import Stage, is_stringy, register_stage

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
        pa.field("width", pa.int32()),        # image only
        pa.field("height", pa.int32()),       # image only
        pa.field("sample_rate", pa.int32()),  # audio only
        pa.field("n_samples", pa.int64()),    # audio only
        pa.field("feature", pa.list_(pa.float32())),
    ]
)


def _histogram_feature(body: np.ndarray) -> np.ndarray:
    hist = np.bincount(body >> 4, minlength=16).astype(np.float32)
    total = hist.sum() or 1.0
    return hist / total


def decode_bmp(payload: bytes) -> dict:
    """Parse a BITMAPINFOHEADER BMP: magic, pixel offset, width/height;
    16-bin histogram over the pixel bytes. Pure struct/numpy."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    body = np.frombuffer(payload, dtype=np.uint8, offset=pixel_offset)
    return {
        "width": int(width),
        "height": int(abs(height)),
        "sample_rate": None,
        "n_samples": None,
        "feature": _histogram_feature(body),
    }


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM file: fmt chunk (channels, sample rate,
    bits) and data chunk size -> sample count. Pure struct/numpy."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos = 12
    fmt = None
    data_size = None
    data_off = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data_size, data_off = size, pos + 8
        pos += 8 + size + (size & 1)
    if fmt is None or data_size is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    _, channels, sample_rate, _, block_align, _ = fmt
    body = np.frombuffer(payload, dtype=np.uint8, offset=data_off, count=data_size)
    return {
        "width": None,
        "height": None,
        "sample_rate": int(sample_rate),
        "n_samples": int(data_size // block_align),
        "feature": _histogram_feature(body),
    }


def _stub_decode(payload: bytes, content_type: str) -> dict:
    """Injection point for real codecs (PIL.Image.open / soundfile /
    pyav — absent from this container). The deterministic fake derives
    stable pseudo-dimensions and a histogram feature from the payload so
    unknown content types still exercise the full pipeline."""
    if payload is None:
        raise NotImplementedError("media decode requires a payload")
    b = np.frombuffer(payload, dtype=np.uint8)
    return {
        "width": int(64 + (len(b) % 512)),
        "height": int(64 + ((len(b) // 7) % 512)),
        "sample_rate": None,
        "n_samples": None,
        "feature": _histogram_feature(b),
    }


def default_decode(payload: bytes, content_type: str) -> dict:
    """Dispatch by content type: real BMP/WAV parsers, stub otherwise."""
    if content_type == "image/bmp":
        return decode_bmp(payload)
    if content_type == "audio/wav":
        return decode_wav(payload)
    return _stub_decode(payload, content_type)


def _is_binaryish(t: pa.DataType) -> bool:
    return pa.types.is_binary(t) or pa.types.is_large_binary(t)


_MEDIA_INPUT = {
    "media_id": pa.types.is_integer,
    "content_type": None,  # filled below (is_stringy, late import)
    "payload": _is_binaryish,
}


class MediaFeatureExtractor(Stage):
    """Actor-pool decode + feature-extract stage.

    ``__init__`` binds the (possibly heavy) decoder once per actor; use
    small ``batch_size`` for large payloads so batch x concurrency fits
    worker heap (SURVEY.md §7.4 "very wide rows"). Stage-registered
    (§2.6): schema-REPLACING, so ``evolves = False`` and the fixed
    output layout is declared wholesale."""

    name = "media_features"
    description = "decode media payloads into typed feature rows"
    evolves = False

    def required_input(self):
        return {**_MEDIA_INPUT, "content_type": is_stringy}

    def output_schema(self, schema_in: pa.Schema) -> pa.Schema:
        return pa.schema([
            ("media_id", pa.int64()),
            ("content_type", pa.string()),
            ("n_bytes", pa.int64()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("sample_rate", pa.int32()),
            ("n_samples", pa.int64()),
            ("feature", pa.list_(pa.float32())),
        ])

    def __init__(self, decode_fn: Callable[[bytes, str], dict] | None = None):
        self.decode = decode_fn or default_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        ctypes = batch.column("content_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {k: [] for k in ("media_id", "content_type", "n_bytes", "width",
                                "height", "sample_rate", "n_samples", "feature")}
        for mid, ct, p in zip(ids, ctypes, payloads):
            if p is None:
                # MEDIA_SCHEMA declares payload nullable; fail with the
                # decode contract's message instead of a TypeError deep
                # inside a typed parser (review finding)
                raise NotImplementedError(
                    f"media decode requires a payload (media_id={mid})"
                )
            d = self.decode(p, ct)
            rows["media_id"].append(mid)
            rows["content_type"].append(ct)
            rows["n_bytes"].append(len(p))
            rows["width"].append(d["width"])
            rows["height"].append(d["height"])
            rows["sample_rate"].append(d.get("sample_rate"))
            rows["n_samples"].append(d.get("n_samples"))
            rows["feature"].append(d["feature"])
        return pa.table(
            {
                "media_id": pa.array(rows["media_id"], pa.int64()),
                "content_type": pa.array(rows["content_type"], pa.string()),
                "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
                "n_samples": pa.array(rows["n_samples"], pa.int64()),
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
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Media feature pipeline: small batches (payloads are wide), actor
    pool cluster-scaled by default (CLAUDE.md: never a literal),
    Arrow in/out."""
    from sapray.ops import actor_pool

    pool = (1, concurrency) if concurrency is not None else actor_pool()
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_fn": decode_fn},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
    )


# --------------------------------------------------------------- synthesis


def make_bmp(width: int, height: int, seed: int) -> bytes:
    """A real 24-bit BMP: 54-byte header + 4-byte-aligned pixel rows."""
    row = ((3 * width + 3) // 4) * 4
    pix = np.random.default_rng(seed).integers(0, 256, size=row * height,
                                               dtype=np.uint8).tobytes()
    size = 54 + len(pix)
    header = (
        b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix),
                      2835, 2835, 0, 0)
    )
    return header + pix


def make_wav(sample_rate: int, n_samples: int, channels: int, seed: int) -> bytes:
    """A real RIFF/PCM WAV: 44-byte header + 16-bit samples."""
    block_align = channels * 2
    data = np.random.default_rng(seed).integers(
        -32768, 32767, size=n_samples * channels, dtype=np.int16
    ).tobytes()
    header = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                                sample_rate * block_align, block_align, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return header + data


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media corpus of REAL format bytes: even ids are
    24-bit BMPs, odd ids are PCM WAVs; every header field is an integer
    formula of media_id (mirrored by the SQL oracle), so a correct
    decode — actual byte parsing — is externally checkable."""
    payloads, ctypes = [], []
    for i in range(n):
        if i % 2 == 0:
            payloads.append(make_bmp(8 + i % 32, 8 + (i * 3) % 32, seed + i))
            ctypes.append("image/bmp")
        else:
            payloads.append(
                make_wav(8000 + 100 * i, 64 + 10 * i, 1 + i % 2, seed + i)
            )
            ctypes.append("audio/wav")
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "content_type": pa.array(ctypes),
            "payload": pa.array(payloads, pa.binary()),
            "etag": pa.array([f'W/"{i}"' for i in range(n)]),
        }
    )


# ----------------------------------------------------- transform operators


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bit BMP, pure numpy: parse
    the header, gather pixel rows (4-byte-aligned), index-sample to the
    target grid, re-encode a valid BMP."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    # a negative BITMAPINFOHEADER height means TOP-DOWN row order; the
    # output header below declares bottom-up, so flip such rows into
    # bottom-up order instead of re-labelling them (review finding: the
    # old abs() silently inverted top-down images)
    top_down = height < 0
    height = abs(height)
    row = ((3 * width + 3) // 4) * 4
    body = np.frombuffer(payload, dtype=np.uint8, offset=pixel_offset,
                         count=row * height).reshape(height, row)
    if top_down:
        body = body[::-1]
    pix = body[:, : 3 * width].reshape(height, width, 3)
    ys = np.minimum((np.arange(out_h) * height) // out_h, height - 1)
    xs = np.minimum((np.arange(out_w) * width) // out_w, width - 1)
    out = pix[ys][:, xs]  # nearest neighbor
    out_row = ((3 * out_w + 3) // 4) * 4
    padded = np.zeros((out_h, out_row), dtype=np.uint8)
    padded[:, : 3 * out_w] = out.reshape(out_h, 3 * out_w)
    data = padded.tobytes()
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, out_w, out_h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    )
    return header + data


# RAWV: the engine's documented synthetic video container (no codec libs
# in this sandbox): b"RAWV" + u32 n_frames + u32 width + u32 height,
# then n_frames grayscale frames of width*height bytes each.
def make_rawv(n_frames: int, width: int, height: int, seed: int) -> bytes:
    frames = np.random.default_rng(seed).integers(
        0, 256, size=n_frames * width * height, dtype=np.uint8
    ).tobytes()
    return b"RAWV" + struct.pack("<III", n_frames, width, height) + frames


def sample_frames(payload: bytes, every_k: int) -> list[bytes]:
    """Frame-sample a RAWV container: every k-th frame as raw bytes."""
    if payload[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    n, w, h = struct.unpack_from("<III", payload, 4)
    fsz = w * h
    body = memoryview(payload)[16:]
    return [bytes(body[i * fsz : (i + 1) * fsz]) for i in range(0, n, every_k)]


class MediaTransformer(Stage):
    """Actor-pool media TRANSFORM stage (vs the feature EXTRACT stage):
    resizes images to a fixed thumbnail and frame-samples videos,
    emitting one row per output artifact. Unknown types pass through.
    Stage-registered, schema-replacing (one input row can emit several
    frame rows)."""

    name = "media_transform"
    description = "resize images / frame-sample videos into artifacts"
    evolves = False

    def required_input(self):
        return {**_MEDIA_INPUT, "content_type": is_stringy}

    def output_schema(self, schema_in: pa.Schema) -> pa.Schema:
        return pa.schema([
            ("media_id", pa.int64()),
            ("kind", pa.string()),
            ("artifact", pa.binary()),
        ])

    def __init__(self, thumb_w: int = 16, thumb_h: int = 16, every_k: int = 4):
        self.tw, self.th, self.k = thumb_w, thumb_h, every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "kind": [], "artifact": []}
        for mid, ct, p in zip(
            batch.column("media_id").to_pylist(),
            batch.column("content_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if ct == "image/bmp":
                out["media_id"].append(mid)
                out["kind"].append("thumbnail")
                out["artifact"].append(resize_bmp(p, self.tw, self.th))
            elif ct == "video/rawv":
                for f in sample_frames(p, self.k):
                    out["media_id"].append(mid)
                    out["kind"].append("frame")
                    out["artifact"].append(f)
            else:
                out["media_id"].append(mid)
                out["kind"].append("passthrough")
                out["artifact"].append(p)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "kind": pa.array(out["kind"], pa.string()),
                "artifact": pa.array(out["artifact"], pa.binary()),
            }
        )


register_stage(MediaFeatureExtractor)
register_stage(MediaTransformer)
