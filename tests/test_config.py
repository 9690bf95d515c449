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
