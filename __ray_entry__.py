"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the sapray library) calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS_NAME = "sf0.01"


def entry() -> Any:
    """Flagship CDC pipeline on sf0.001: generate the deterministic
    change log, replay it through the full engine (decode -> partition ->
    salted shuffle -> LWW appliers -> exactly-once sink), return the
    final lake state as a Dataset."""
    import ray.data

    from sapray.queries import cdc_replay_flagship

    state = cdc_replay_flagship(SF_SMOKE)
    return ray.data.from_arrow(state)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from sapray.queries import registry

    return {name: spec["fn"] for name, spec in registry(SF_CORRECTNESS_NAME).items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops).

    The flagship oracle reads the deterministic change log from /tmp —
    generated here eagerly (pure pyarrow, no Ray needed) so the SQL is
    runnable regardless of query/oracle execution order.
    """
    from sapray.changelog import generate_changelog
    from sapray.queries import _changelog_dir_for, _ensure_exports, registry

    sf_dir = f"/root/testdata/{SF_CORRECTNESS_NAME}"
    if os.path.isdir(sf_dir):
        generate_changelog(sf_dir, _changelog_dir_for(sf_dir), n_updates=3000)
        _ensure_exports(sf_dir)  # JSONL/CSV source-query inputs + oracles
    return {
        name: spec["sql"]
        for name, spec in registry(SF_CORRECTNESS_NAME).items()
        if spec["sql"] is not None
    }
