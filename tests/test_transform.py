"""Transformer-kernel conformance tests (the AllDataTypes corpus).

Mirrors the reference's golden per-type transform tests
(``reference src/test/java/io/cdap/plugin/sap/ODataEntryToRecordTransformerTest.java:61-732``)
with an Arrow fixture per FIXTURES.md §3, plus the CDC decode path."""

import datetime
import decimal

import pyarrow as pa
import pytest

from sapray.schema import edm_to_arrow
from sapray.transform import (
    EVENT_SCHEMA,
    decode_entity_batch,
    decode_events,
    validate_event_batch,
)

ALLTYPES = pa.schema(
    [
        pa.field("id", pa.string(), False),
        pa.field("bin", pa.binary()),
        pa.field("flag", pa.bool_()),
        pa.field("i32", pa.int32()),
        pa.field("i64", pa.int64()),
        pa.field("f32", pa.float32()),
        pa.field("f64", pa.float64()),
        pa.field("dec", pa.decimal128(16, 3)),
        pa.field("ts", pa.timestamp("us")),
        pa.field("tod", pa.time64("us")),
        pa.field("dto", pa.string()),
        pa.field("dur", pa.string()),
        pa.field("guid", pa.string()),
        pa.field("stream", edm_to_arrow("Edm.Stream")),
        pa.field("pt", edm_to_arrow("Edm.GeometryPoint")),
    ]
)


def _raw_batch() -> pa.Table:
    """Raw batch with narrower/looser types than the target (coercions)."""
    return pa.table(
        {
            "id": pa.array(["a", "b", "c"]),
            "bin": pa.array([b"x", None, b"z"]),
            "flag": pa.array([True, None, False]),
            "i32": pa.array([1, None, 3], pa.int16()),  # narrow -> int32 (M4)
            "i64": pa.array([10, None, 30], pa.int32()),  # int32 -> int64 (M5)
            "f32": pa.array([1.5, None, 2.5], pa.float32()),
            "f64": pa.array([1.25, None, 3.5], pa.float32()),  # float -> double (M6)
            "dec": pa.array(
                [decimal.Decimal("12.5"), None, decimal.Decimal("1.125")],
                pa.decimal128(10, 3),
            ),
            "ts": pa.array(
                [datetime.datetime(2019, 8, 29, 14, 52, 8), None,
                 datetime.datetime(2020, 1, 1)],
                pa.timestamp("ms"),  # millis -> micros (M9)
            ),
            "tod": pa.array(
                [datetime.time(14, 52, 8), None, datetime.time(0, 0, 1)],
                pa.time64("us"),
            ),
            "dto": pa.array(["2019-08-29T14:52:08.155+02:00", None, "2020-01-01T00:00:00Z"]),
            "dur": pa.array(["P12DT23H59M59.999999999999S", None, "PT1S"]),
            "guid": pa.array(["00000000-0000-0000-0000-000000000001", None, "x"]),
            "stream": pa.array(
                [
                    {"mediaEtag": "W/\"etag\"", "mediaContentType": "image/jpeg",
                     "mediaReadLink": "http://r", "mediaEditLink": "http://e"},
                    None,
                    {"mediaEtag": None, "mediaContentType": None,
                     "mediaReadLink": "http://r2", "mediaEditLink": None},
                ],
                edm_to_arrow("Edm.Stream"),
            ),
            "pt": pa.array(
                [{"dimension": "GEOMETRY", "x": 1.0, "y": 2.0, "z": 0.0}, None,
                 {"dimension": "GEOGRAPHY", "x": -1.5, "y": 3.25, "z": 7.0}],
                edm_to_arrow("Edm.GeometryPoint"),
            ),
        }
    )


def test_alltypes_decode_golden():
    out = decode_entity_batch(_raw_batch(), ALLTYPES)
    assert out.schema.equals(ALLTYPES)
    rows = out.to_pylist()
    # golden values (mirrors per-field equality asserts, …TransformerTest.java:139-156)
    assert rows[0]["i32"] == 1 and rows[0]["i64"] == 10
    assert rows[0]["f64"] == 1.25
    assert rows[0]["dec"] == decimal.Decimal("12.500")
    assert rows[0]["ts"] == datetime.datetime(2019, 8, 29, 14, 52, 8)
    assert rows[0]["dto"] == "2019-08-29T14:52:08.155+02:00"
    assert rows[0]["dur"] == "P12DT23H59M59.999999999999S"
    assert rows[0]["stream"]["mediaContentType"] == "image/jpeg"
    assert rows[0]["pt"] == {"dimension": "GEOMETRY", "x": 1.0, "y": 2.0, "z": 0.0}
    # null passthrough (M2, …Transformer.java:93-95)
    assert rows[1]["bin"] is None and rows[1]["dec"] is None and rows[1]["pt"] is None


def test_missing_nullable_field_fills_null():
    # missing property -> null (…Transformer.java:79-82)
    t = pa.table({"id": pa.array(["a"])})
    out = decode_entity_batch(t, ALLTYPES)
    assert out.column("i64").null_count == 1


def test_missing_non_nullable_field_errors():
    t = pa.table({"i64": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="Field 'id' is missing"):
        decode_entity_batch(t, ALLTYPES)


def test_type_guard_message_shape():
    # mirrors UnexpectedFormatException (…Transformer.java:423-436)
    t = _raw_batch().set_column(
        _raw_batch().column_names.index("i32"), "i32", pa.array(["not-an-int", "x", "y"])
    )
    with pytest.raises(ValueError, match="Field 'i32' is expected to be of type 'int32'"):
        decode_entity_batch(t, ALLTYPES)


def test_decimal_scale_overflow_errors():
    # value scale > schema scale is an error (…Transformer.java:380-384)
    target = pa.schema([pa.field("dec", pa.decimal128(16, 2))])
    t = pa.table({"dec": pa.array([decimal.Decimal("1.125")], pa.decimal128(10, 3))})
    with pytest.raises(ValueError, match="scale"):
        decode_entity_batch(t, target)


def test_decimal_from_float_rounds():
    # double -> decimal rounds (HALF_EVEN in the reference, …Transformer.java:411-415)
    target = pa.schema([pa.field("dec", pa.decimal128(16, 2))])
    t = pa.table({"dec": pa.array([1.005], pa.float64())})
    out = decode_entity_batch(t, target)
    assert out.column("dec")[0].as_py() in (
        decimal.Decimal("1.00"), decimal.Decimal("1.01"),
    )


# --------------------------------------------------------------------- CDC decode

def _raw_event_batch(schema_ver: int) -> pa.Table:
    cols = {
        "seq": pa.array([1, 2], pa.int64()),
        "op": pa.array(["I", "U"]),
        "repo": pa.array(["org0/repo0", "org1/repo1"]),
        "path": pa.array(["a.py", "b.rs"]),
        "commit": pa.array(["c1", "c2"]),
        "commit_date": pa.array(["20240101", "20240102"]),
        "commit_time": pa.array(["000000", "120000"]),
        "lang": pa.array(["py  ", "rs  "]),  # ABAP fixed-width padding
        "content": pa.array(["print(1)", "fn main(){}"]),
        "schema_ver": pa.array([schema_ver, schema_ver], pa.int32()),
    }
    if schema_ver >= 2:
        t = pa.int32() if schema_ver == 2 else pa.int64()
        cols["size_bytes"] = pa.array([8, 11], t)
    return pa.table(cols)


@pytest.mark.parametrize("ver", [1, 2, 3])
def test_decode_events_normalizes_all_versions(ver):
    out = decode_events(_raw_event_batch(ver))
    assert out.schema.equals(EVENT_SCHEMA)
    validate_event_batch(out)
    rows = out.to_pylist()
    assert rows[0]["lang"] == "py"  # padding trimmed
    assert rows[0]["commit_ts"] == datetime.datetime(2024, 1, 1)
    assert rows[1]["commit_ts"] == datetime.datetime(2024, 1, 2, 12, 0, 0)
    if ver == 1:
        assert out.column("size_bytes").null_count == 2  # add-column fill
    else:
        assert rows[1]["size_bytes"] == 11  # widened to int64


def test_validate_event_batch_error_shape():
    bad = decode_events(_raw_event_batch(1)).drop_columns(["seq"])
    with pytest.raises(ValueError, match="Field 'seq' is missing"):
        validate_event_batch(bad)


def test_source_schema_guard(ray_session, tmp_path):
    """Non-parquet sources apply the validateFieldsMatch analog: an
    expected field the data lacks, a type outside the widening lattice,
    or relaxed nullability must raise SchemaCompatError
    (SapODataConfig.java:262-298)."""
    import pandas as pd
    import pyarrow as pa
    import pytest as _pytest

    from sapray import sources
    from sapray.schema import SchemaCompatError

    p = str(tmp_path / "d.jsonl")
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_json(
        p, orient="records", lines=True
    )
    ok = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    assert sources.read_jsonl(p, expected_schema=ok).count() == 2
    missing = pa.schema([pa.field("a", pa.int64()), pa.field("zz", pa.string())])
    with _pytest.raises(SchemaCompatError):
        sources.read_jsonl(p, expected_schema=missing)
    wrong_type = pa.schema([pa.field("a", pa.string()), pa.field("b", pa.string())])
    with _pytest.raises(SchemaCompatError):
        sources.read_jsonl(p, expected_schema=wrong_type)


def test_source_sinks_roundtrip(ray_session, tmp_path):
    """write_jsonl / write_csv produce sharded files our own readers
    (and DuckDB) load back identically."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from sapray import sources

    t = pa.table({
        "a": pa.array([1, 2, 3, 4], pa.int64()),
        "b": pa.array(['x', 'y,with,commas', 'z"q"', 'w'], pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    sources.write_jsonl(ds, jdir)
    sources.write_csv(ds, cdir)
    import glob as _glob

    jfiles = sorted(_glob.glob(jdir + "/*"))
    cfiles = sorted(_glob.glob(cdir + "/*"))
    assert len(jfiles) >= 2 and len(cfiles) >= 2  # sharded, not one file
    back_j = sources.read_jsonl(jfiles).to_pandas().sort_values("a")
    back_c = sources.read_csv(cfiles).to_pandas().sort_values("a")
    expect = t.to_pandas().sort_values("a")
    for back in (back_j, back_c):
        pd.testing.assert_frame_equal(
            back.reset_index(drop=True), expect.reset_index(drop=True)
        )
    duck = duckdb.sql(
        f"SELECT * FROM read_json_auto('{jdir}/*') ORDER BY a"
    ).df()
    pd.testing.assert_frame_equal(duck, expect.reset_index(drop=True))


# --------------------------------------------------------------------------
# nested JSON parsing (sapray.jsonx)
# --------------------------------------------------------------------------


def test_jsonx_nested_struct_and_list_roundtrip():
    from sapray import jsonx

    docs = [
        '{"user": {"id": 5, "type": "x"}, "vals": [1, 2]}',
        '{"user": {"id": 7, "type": "y"}, "vals": []}',
        None,
        '{"vals": [9]}',
    ]
    schema = pa.schema([
        pa.field("user", pa.struct([
            pa.field("id", pa.int64()), pa.field("type", pa.string()),
        ])),
        pa.field("vals", pa.list_(pa.int64())),
    ])
    out = jsonx.parse_json_column(pa.array(docs, pa.string()), schema)
    assert out.num_rows == 4
    rows = out.to_pylist()
    assert rows[0] == {"user": {"id": 5, "type": "x"}, "vals": [1, 2]}
    assert rows[1]["vals"] == []
    assert rows[2] == {"user": None, "vals": None}  # null doc -> {}
    assert rows[3]["user"] is None and rows[3]["vals"] == [9]


def test_jsonx_large_string_and_escaped_newlines():
    from sapray import jsonx

    docs = ['{"s": "a\\nb"}', '{"s": "plain"}']  # escaped \n inside JSON
    out = jsonx.parse_json_column(pa.array(docs, pa.large_string()))
    assert out.column("s").to_pylist() == ["a\nb", "plain"]


def test_jsonx_empty_column():
    from sapray import jsonx

    schema = pa.schema([pa.field("k", pa.int64())])
    out = jsonx.parse_json_column(pa.array([], pa.string()), schema)
    assert out.num_rows == 0 and out.schema == schema


def test_jsonx_sliced_column_offsets():
    """A sliced Arrow array has a non-zero buffer offset; the scatter
    must honor it."""
    from sapray import jsonx

    arr = pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}', '{"k": 4}'])
    out = jsonx.parse_json_column(arr.slice(1, 2))
    assert out.column("k").to_pylist() == [2, 3]


def test_jsonx_empty_and_whitespace_docs_stay_aligned():
    """The NDJSON reader skips blank lines; empty/whitespace docs must be
    rewritten to {} or every later row misaligns (review finding: a doc
    with an embedded raw newline could cancel the count change and defeat
    the row-count guard)."""
    from sapray import jsonx

    out = jsonx.parse_json_column(
        pa.array(['{"k": 1}', "", "  ", None, '{"k": 3}'])
    )
    assert out.column("k").to_pylist() == [1, None, None, None, 3]
    # raw embedded newline is now always detected, even next to empties
    with pytest.raises(ValueError, match="newline"):
        jsonx.parse_json_column(pa.array(['{"k": 1}\n{"k": 99}', "", '{"k": 3}']))
