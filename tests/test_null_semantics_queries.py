"""Null-bearing differential for the round-5-final event queries.

The shipped testdata has no NULL event_type / value rows, so the
standard oracle gate cannot exercise SQL NULL semantics; this builds a
tiny null-bearing events table and replays the engine vs DuckDB on it
(review findings: COUNT FILTER over all-null predicates, JOIN USING
dropping NULL keys, NULL-value arithmetic vs non-null NaN).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from sapray.queries import registry
from tests.oracle_harness import compare, duck_con


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullsf")
    rng = np.random.default_rng(3)
    n = 400
    types = rng.choice(
        np.array(["click", "view", "error"], dtype=object), n
    )
    types[rng.random(n) < 0.15] = None  # NULL event_type rows
    values = rng.uniform(-50, 150, n).round(2)
    vals = [None if rng.random() < 0.1 else float(v) for v in values]
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            np.datetime64("2024-01-01") + rng.integers(0, 10**6, n).astype(
                "timedelta64[s]"
            ).astype("timedelta64[us]")
        ),
        "user_id": pa.array(rng.integers(0, 20, n), pa.int64()),
        "event_type": pa.array(list(types), pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["conditional_agg_events", "iqr_outliers_by_type", "minmax_norm_events"],
)
def test_null_bearing_events_match_oracle(name, null_sf_dir, ray_session):
    spec = registry("sf0.001")[name]
    con = duck_con(null_sf_dir)
    ok, msg = compare(name, spec["fn"](null_sf_dir), spec["sql"], con)
    assert ok, f"{name} on null-bearing events: {msg}"
