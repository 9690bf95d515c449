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


def streaming_sessionize(
    ds: ray.data.Dataset,
    key: str,
    ts_column: str,
    gap: np.timedelta64,
    num_buckets: int = 4,
    batch_size: int = 4096,
) -> pa.Table:
    """Run the incremental sessionizer over a time-ordered tail of ``ds``.

    Returns (key, n_sessions) as an Arrow table. The driver never holds
    more than one micro-batch; actors hold per-key scalars only.
    """
    gap_us = int(gap.astype("timedelta64[us]").astype(np.int64))
    actors = [SessionBucketActor.remote(gap_us) for _ in range(num_buckets)]
    ordered = ds.sort(ts_column)
    pending: list = []
    for batch in ordered.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        keys = batch.column(key).to_numpy(zero_copy_only=False)
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
        pending = [
            actors[b].feed.remote(keys[bucket == b], tsi[bucket == b])
            for b in range(num_buckets)
            if (bucket == b).any()
        ]
    if pending:
        ray.get(pending)
    frames = ray.get([a.flush.remote() for a in actors])
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    return pa.table(
        {
            key: pa.array(out["key"].to_numpy()),
            "n_sessions": pa.array(out["n_sessions"].to_numpy(np.int64)),
        }
    )
