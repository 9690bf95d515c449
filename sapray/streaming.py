"""Streaming-shaped incremental windowing over raw Ray actors.

Ray Data has no event-time windows or watermarks; for stream semantics
the guide-sanctioned shape is an actor per key-hash bucket holding
incremental state, fed micro-batches in timestamp order. This module
implements gap-based sessionization that way: a driver-side tail
consumes a time-ordered batch stream (``ds.sort(ts).iter_batches`` here;
a log tailer in production) and fans each micro-batch out to
``num_buckets`` session actors, each of which updates per-key running
state (last event ts, open-session count) with vectorized numpy — the
per-batch work is one sort + segment sweep, no Python per row.

This is deliberately the "(c) raw Ray actors" tier of the custom-
operator ladder (task brief): the batch-mode equivalent
(:func:`sapray.window.session_counts`) is the (a)-tier composition, and
the two are cross-checked in tests and by the shared SQL oracle.

Ordering assumption (documented per the brief): batches must arrive in
non-decreasing ``ts`` order per key; the tail enforces it by sorting
the stream. State per actor is O(live keys in its buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


@ray.remote
class SessionBucketActor:
    """Incremental gap-sessionizer for the keys hashing to one bucket.

    State: per-key (last_ts, n_sessions). ``feed`` consumes a
    micro-batch (already filtered to this bucket, sorted by (key, ts))
    and advances the state; ``flush`` returns the final counts.
    """

    def __init__(self, gap_us: int):
        self.gap = np.int64(gap_us)
        self.last_ts: dict = {}
        self.n_sessions: dict = {}

    def feed(self, keys: np.ndarray, tsi: np.ndarray) -> int:
        order = np.lexsort((tsi, keys))
        keys, tsi = keys[order], tsi[order]
        starts = np.concatenate([[0], np.nonzero(keys[:-1] != keys[1:])[0] + 1])
        ends = np.concatenate([starts[1:], [len(keys)]])
        for s, e in zip(starts, ends):
            k = keys[s]
            seg = tsi[s:e]
            gaps = int((np.diff(seg) > self.gap).sum())
            prev = self.last_ts.get(k)
            opens = gaps + (
                1 if prev is None or (seg[0] - prev) > self.gap else 0
            )
            self.n_sessions[k] = self.n_sessions.get(k, 0) + opens
            self.last_ts[k] = seg[-1]
        return len(keys)

    def flush(self) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": list(self.n_sessions), "n_sessions": list(self.n_sessions.values())}
        )


# reserved NULL-key stand-ins: actor state dicts and np.lexsort cannot
# handle None (object comparison raises) or NaN (NaN != NaN splinters
# sessions, dict.get(nan) misses) — fill nulls with one sentinel per
# type BEFORE feeding, matching the batch twin window._key_codes'
# "all NULL keys are ONE key" semantics, and map it back to a null
# output slot at flush. The integer sentinel is derived from the key
# column's CONCRETE width (int64's min raises inside fill_null on an
# int32/int16 key — advisory finding), and the feed loop raises loudly
# if the sentinel value actually occurs as a real key.
_NULL_STR = "\x00\x00sapray.null\x00"


def _null_sentinel(t: pa.DataType):
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _NULL_STR
    if pa.types.is_integer(t):
        info = np.iinfo(np.dtype(t.to_pandas_dtype()))
        # signed: the most negative value; unsigned: the max (0 is far
        # too common a real key to reserve)
        return int(info.min) if info.min < 0 else int(info.max)
    raise TypeError(
        f"streaming_sessionize supports int/string keys, got {t}"
    )


def streaming_sessionize(
    ds: ray.data.Dataset,
    key: str,
    ts_column: str,
    gap: np.timedelta64,
    num_buckets: int = 4,
    batch_size: int = 4096,
) -> pa.Table:
    """Run the incremental sessionizer over a time-ordered tail of ``ds``.

    Returns (key, n_sessions) as an Arrow table (key type preserved, one
    row per key, NULL keys grouped as ONE key like SQL GROUP BY / the
    batch twin). The driver never holds more than one micro-batch;
    actors hold per-key scalars only.
    """
    import pyarrow.compute as pc

    gap_us = int(gap.astype("timedelta64[us]").astype(np.int64))
    actors = [SessionBucketActor.remote(gap_us) for _ in range(num_buckets)]
    ordered = ds.sort(ts_column)
    from sapray.stage import _dataset_schema

    key_type = _dataset_schema(ordered).field(key).type
    sentinel = _null_sentinel(key_type)
    pending: list = []
    saw_null = saw_sentinel = False
    for batch in ordered.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        col = batch.column(key)
        # the merge hazard needs BOTH a real sentinel-valued key and an
        # actual NULL (only then does fill_null conflate them) — a
        # sentinel value alone (e.g. a legitimate int8 -128 key in a
        # null-free column) is fine, so track both sides across batches
        # and raise before the offending batch ships to the actors
        saw_null = saw_null or col.null_count > 0
        saw_sentinel = saw_sentinel or bool(
            pc.any(pc.equal(col, pa.scalar(sentinel, key_type))).as_py()
        )
        if saw_null and saw_sentinel:
            raise ValueError(
                f"streaming_sessionize: key column {key!r} contains both "
                f"NULLs and the reserved NULL sentinel value {sentinel!r} "
                "— they would silently merge into one group; recode the key"
            )
        keys = pc.fill_null(col, sentinel).to_numpy(zero_copy_only=False)
        tsi = (
            batch.column(ts_column)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        # value-deterministic bucket id for int or string keys
        bucket = pd.util.hash_array(keys, categorize=False) % num_buckets
        # wait for the previous wave before sending the next: preserves
        # per-actor arrival order (the operator's one ordering invariant)
        if pending:
            ray.get(pending)
        pending = []
        for b in range(num_buckets):
            m = bucket == b
            if m.any():
                pending.append(actors[b].feed.remote(keys[m], tsi[m]))
    if pending:
        ray.get(pending)
    frames = ray.get([a.flush.remote() for a in actors])
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    key_vals = out["key"].to_numpy() if len(out) else np.array([], object)
    # typed output even when empty; decode the sentinel back to a NULL
    # slot ONLY when the input actually carried NULLs — otherwise a
    # sentinel-valued REAL key (e.g. a legitimate int8 -128) must pass
    # through unchanged (review finding)
    key_arr = pa.array(key_vals, type=key_type)
    if saw_null:
        null_mask = pc.equal(key_arr, pa.scalar(sentinel, key_type))
        key_arr = pc.if_else(null_mask, pa.scalar(None, key_type), key_arr)
    return pa.table(
        {
            key: key_arr,
            "n_sessions": pa.array(
                out["n_sessions"].to_numpy(np.int64)
                if len(out) else np.array([], np.int64)
            ),
        }
    )
