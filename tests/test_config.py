"""Config validation tests, mirroring the reference's failure-collector
tests (``reference src/test/java/io/cdap/plugin/sap/SapODataConfigTest.java:35-291``)."""

import pytest

from sapray.config import CDCConfig, ConfigError, parse_select, sanitize_query


def test_valid_config_passes():
    CDCConfig().validate()


def test_invalid_reference_name():
    with pytest.raises(ConfigError, match="Invalid reference name"):
        CDCConfig(reference_name="bad name!").validate()


def test_empty_reference_name():
    with pytest.raises(ConfigError, match="Reference Name must be specified"):
        CDCConfig(reference_name="").validate()


def test_errors_accumulate():
    # mirrors the FailureCollector pattern: all errors reported at once
    try:
        CDCConfig(reference_name="", lake_dir="", num_partitions=0).validate()
        raise AssertionError("should have raised")
    except ConfigError as e:
        assert len(e.errors) == 3


def test_sanitize_query_strips_leading_question_marks():
    # SapODataConfig.java:122-134
    assert sanitize_query("??$top=2&$select=a") == "$top=2&$select=a"
    assert sanitize_query(None) == ""
    assert sanitize_query("") == ""


def test_parse_select_positions():
    # SapODataConfig.java:144-155 — order preserved, any position in query
    q = "?$top=2&$skip=2&$select=BuyerName,SalesOrder&$filter=x eq 'y'"
    assert parse_select(q) == ["BuyerName", "SalesOrder"]
    assert parse_select("$select=a") == ["a"]
    assert parse_select("$top=2") == []


def test_bad_threshold_and_salts():
    with pytest.raises(ConfigError):
        CDCConfig(hot_key_threshold=0.0).validate()
    with pytest.raises(ConfigError):
        CDCConfig(num_salts=0).validate()


def test_parse_filter_reference_shape():
    """The reference's canonical query string compiles end to end
    (SapODataConfigTest.java:59 — %27-encoded quotes, field eq string)."""
    import pyarrow.dataset  # noqa: F401 (expression backend)

    from sapray.config import parse_filter

    e = parse_filter(
        "?$top=2&$skip=2&$select=BuyerName&$filter=BuyerName eq %27TECUM%27"
    )
    assert e is not None and "BuyerName" in str(e) and "TECUM" in str(e)
    assert parse_filter("?$top=2") is None


def test_filter_grammar_compiles():
    import pyarrow as pa

    from sapray.config import filter_to_expression

    t = pa.table({
        "a": pa.array([1, 2, 3, None], pa.int64()),
        "s": pa.array(["x", "it's", "y", "x"]),
        "f": pa.array([1.5, 2.5, None, 0.0], pa.float64()),
        "b": pa.array([True, False, True, None]),
    })
    cases = [
        ("a eq 2", [2]),
        ("a ne 2", [1, 3]),                      # SQL 3VL: NULL drops
        ("a ge 2 and f lt 3.0", [2]),
        ("a eq 1 or s eq 'y'", [1, 3]),
        ("not a eq 2 and a le 3", [1, 3]),
        ("(a eq 1 or a eq 3) and f gt 1.0", [1]),
        ("s eq 'it''s'", [2]),                   # '' escape
        ("a eq null", [None]),                   # IS NULL
        ("a ne null and b eq true", [1, 3]),     # IS NOT NULL
        ("2 le a", [2, 3]),                      # literal-on-the-left flips
    ]
    for text, want in cases:
        got = t.filter(filter_to_expression(text)).column("a").to_pylist()
        assert got == want, f"{text}: {got} != {want}"


def test_filter_canonical_functions():
    """OData v2 canonical functions compile to pyarrow kernels and work
    as comparison operands or bare boolean predicates."""
    import pyarrow as pa

    from sapray.config import filter_to_expression

    t = pa.table({
        "name": pa.array(["Alfred", "Bob", " carl ", None, "ALFKI"]),
        "n": pa.array([1, 22, 3, 4, 5], pa.int64()),
    })

    def names(text):
        return t.filter(filter_to_expression(text)).column("name").to_pylist()

    assert names("substringof('lf', name)") == ["Alfred"]
    assert names("startswith(name, 'A') and n lt 3") == ["Alfred"]
    assert names("endswith(name, 'b') eq true") == ["Bob"]
    assert names("tolower(name) eq 'alfki'") == ["ALFKI"]
    assert names("length(trim(name)) eq 4") == [" carl "]
    assert names("not substringof('z', name) and n le 3") == ["Alfred", " carl "]
    assert names("5 eq length(name)") == ["ALFKI"]


def test_filter_function_errors():
    from sapray.config import ConfigError, filter_to_expression

    for bad in ["frobnicate(name)", "substringof('a')",
                "startswith(name, n)", "length(name", "name eq length()"]:
        with pytest.raises(ConfigError):
            filter_to_expression(bad)


def test_filter_malformed_raises():
    from sapray.config import ConfigError, filter_to_expression

    for bad in ["a eqq 3", "a eq", "(a eq 1", "a eq 'x", "null eq null",
                "a eq 1 b", "a and 3", "eq eq eq"]:
        with pytest.raises(ConfigError):
            filter_to_expression(bad)


def test_parse_orderby():
    from sapray.config import ConfigError, parse_orderby

    assert parse_orderby("?$orderby=Field1 asc,Field2 desc,Field3") == [
        ("Field1", False), ("Field2", True), ("Field3", False)
    ]
    assert parse_orderby("$top=2") == []
    with pytest.raises(ConfigError) as e:
        parse_orderby("$orderby=a upward,b c d")
    assert len(e.value.errors) == 2


def test_config_query_options_properties():
    """CDCConfig exposes every compiled query option, and a malformed
    query string fails validate() with accumulated errors (the reference
    validates the query inside SapODataConfig.validate)."""
    cfg = CDCConfig(
        query="?$select=a,b&$top=5&$skip=2&$filter=a gt 3&$orderby=b desc"
    )
    cfg.validate()
    assert cfg.select_columns == ["a", "b"]
    assert cfg.top_skip == (5, 2)
    assert cfg.orderby == [("b", True)]
    assert "a" in str(cfg.filter_expression)

    bad = CDCConfig(query="$filter=a eqq 3&$orderby=b sideways&$top=x")
    with pytest.raises(ConfigError) as e:
        bad.validate()
    assert len(e.value.errors) == 3


def test_parse_top_skip():
    """$top=2&$skip=2 is a first-class query shape in the reference
    (SapODataConfigTest.java:59)."""
    from sapray.config import ConfigError, parse_top_skip

    assert parse_top_skip("?$top=2&$skip=2") == (2, 2)
    assert parse_top_skip("$select=a,b&$top=10") == (10, None)
    assert parse_top_skip("$skip=0") == (None, 0)
    assert parse_top_skip("") == (None, None)
    import pytest

    with pytest.raises(ConfigError) as e:
        parse_top_skip("$top=x&$skip=-3")
    assert len(e.value.errors) == 2


def test_filter_malformed_datetime_accumulates():
    """Review finding: a malformed datetime'...' literal must surface as
    an accumulated ConfigError (naming '$filter'), not a raw stdlib
    ValueError that aborts validate() and drops the other options'
    errors."""
    from sapray.config import ConfigError, filter_to_expression

    with pytest.raises(ConfigError) as e:
        filter_to_expression("ts ge datetime'2023-99-99'")
    assert "$filter" in e.value.errors[0]
    assert "2023-99-99" in e.value.errors[0]

    bad = CDCConfig(query="$filter=ts ge datetime'2023-99-99'&$orderby=b sideways")
    with pytest.raises(ConfigError) as e:
        bad.validate()
    assert len(e.value.errors) == 2


def test_parse_select_and_top_skip_url_decode():
    """$select/$top/$skip extract through the same URL-decoding
    _query_option path as $filter/$orderby (review finding: an encoded
    $select=a%2Cb silently yielded ONE bogus column name)."""
    from sapray.config import parse_select, parse_top_skip

    assert parse_select("?$select=event_id%2Cvalue") == ["event_id", "value"]
    assert parse_select("?$select=a, b") == ["a", "b"]
    assert parse_top_skip("?$top=5&$skip=%32") == (5, 2)
