"""Driver-contract conformance: every registry query vs its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

from sapray.queries import registry
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duck_con

REG = registry("sf0.001")


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(REG))
def test_query_matches_oracle(name, con, ray_session):
    spec = REG[name]
    result = spec["fn"](SF_DIR)
    ok, msg = compare(name, result, spec["sql"], con)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__ray_entry__")
    ds = mod.entry()
    assert ds.count() > 0
    names = set(ds.schema().names)
    assert {"repo", "path", "commit", "seq", "content_sha256"} <= names
    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
