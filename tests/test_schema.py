"""Schema registry / widening-lattice / compat tests.

Mirrors the reference's schema validation behavior
(``reference src/main/java/io/cdap/plugin/sap/SapODataConfig.java:262-298``
and the EDM type mapping ``SapODataSource.java:146-213``)."""

import pyarrow as pa
import pytest

from sapray.schema import (
    SchemaCompatError,
    edm_to_arrow,
    is_widening,
    normalize_table,
    unify_schemas,
    validate_evolution,
)


def test_edm_simple_mappings():
    assert edm_to_arrow("Edm.Binary") == pa.binary()
    assert edm_to_arrow("Edm.Boolean") == pa.bool_()
    for t in ("Byte", "SByte", "Int16", "Int32"):
        assert edm_to_arrow(f"Edm.{t}") == pa.int32()
    assert edm_to_arrow("Edm.Int64") == pa.int64()
    assert edm_to_arrow("Edm.Single") == pa.float32()
    assert edm_to_arrow("Edm.Double") == pa.float64()
    assert edm_to_arrow("Edm.Decimal", 16, 3) == pa.decimal128(16, 3)
    assert edm_to_arrow("Edm.String") == pa.string()
    assert edm_to_arrow("Edm.Guid") == pa.string()
    assert edm_to_arrow("Edm.DateTime") == pa.timestamp("us")
    assert edm_to_arrow("Edm.TimeOfDay") == pa.time64("us")
    # offset/duration deliberately stay strings (SapODataSource.java:158-160,202-203)
    assert edm_to_arrow("Edm.DateTimeOffset") == pa.string()
    assert edm_to_arrow("Edm.Duration") == pa.string()


def test_edm_struct_types():
    st = edm_to_arrow("Edm.Stream")
    assert st.num_fields == 4 and st.field("mediaEtag").type == pa.string()
    pt = edm_to_arrow("Edm.GeometryPoint")
    assert {f.name for f in pt} == {"dimension", "x", "y", "z"}
    poly = edm_to_arrow("Edm.GeometryPolygon")
    assert poly.field("numberOfInteriorRings").type == pa.int32()


def test_edm_unknown_type_errors():
    # mirrors InvalidStageException for unsupported types (SapODataSource.java:208-212)
    with pytest.raises(ValueError, match="Unsupported property type"):
        edm_to_arrow("Edm.Frobnicate")


def test_widening_lattice():
    assert is_widening(pa.int32(), pa.int64())
    assert is_widening(pa.float32(), pa.float64())
    assert is_widening(pa.int32(), pa.float64())
    assert is_widening(pa.decimal128(10, 2), pa.decimal128(14, 2))
    assert is_widening(pa.decimal128(10, 2), pa.decimal128(12, 4))
    assert not is_widening(pa.decimal128(10, 2), pa.decimal128(10, 4))  # digit loss
    assert not is_widening(pa.int64(), pa.int32())
    assert not is_widening(pa.float64(), pa.float32())
    assert not is_widening(pa.string(), pa.int64())
    assert is_widening(pa.string(), pa.large_string())


def test_validate_evolution_rules():
    base = pa.schema([pa.field("a", pa.int32(), False), pa.field("b", pa.string())])
    # legal: widen a, add nullable column
    validate_evolution(base, pa.schema(
        [pa.field("a", pa.int64(), False), pa.field("b", pa.string()), pa.field("c", pa.float64())]
    ))
    # illegal: dropped field
    with pytest.raises(SchemaCompatError, match="dropped"):
        validate_evolution(base, pa.schema([pa.field("a", pa.int64())]))
    # illegal: incompatible type change
    with pytest.raises(SchemaCompatError, match="not compatible"):
        validate_evolution(base, pa.schema(
            [pa.field("a", pa.string()), pa.field("b", pa.string())]
        ))
    # illegal: added non-nullable column
    with pytest.raises(SchemaCompatError, match="must be nullable"):
        validate_evolution(base, pa.schema(
            [pa.field("a", pa.int32(), False), pa.field("b", pa.string()),
             pa.field("c", pa.int64(), False)]
        ))
    # illegal: relaxing a non-nullable base field to nullable
    # (rule 3 of validateFieldsMatch, SapODataConfig.java:262-298)
    with pytest.raises(SchemaCompatError, match="non-nullability"):
        validate_evolution(base, pa.schema(
            [pa.field("a", pa.int32(), True), pa.field("b", pa.string())]
        ))
    # nullable base field staying nullable (or tightening) is fine
    validate_evolution(base, pa.schema(
        [pa.field("a", pa.int32(), False), pa.field("b", pa.string(), False)]
    ))


def test_unify_schemas_add_column_and_widen():
    v1 = pa.schema([pa.field("k", pa.string()), pa.field("n", pa.int32())])
    v2 = pa.schema([pa.field("k", pa.string()), pa.field("n", pa.int32()),
                    pa.field("size", pa.int32())])
    v3 = pa.schema([pa.field("k", pa.string()), pa.field("n", pa.int64()),
                    pa.field("size", pa.int64())])
    u = unify_schemas([v1, v2, v3])
    assert u.field("n").type == pa.int64()
    assert u.field("size").type == pa.int64()
    assert u.field("size").nullable  # absent in v1 -> nullable


def test_unify_schemas_incompatible():
    a = pa.schema([pa.field("x", pa.int64())])
    b = pa.schema([pa.field("x", pa.string())])
    with pytest.raises(SchemaCompatError):
        unify_schemas([a, b])


def test_normalize_table_fill_and_widen():
    target = pa.schema([pa.field("k", pa.string()), pa.field("n", pa.int64()),
                        pa.field("size", pa.int64())])
    t = pa.table({"k": pa.array(["a", "b"]), "n": pa.array([1, 2], pa.int32())})
    out = normalize_table(t, target)
    assert out.schema.equals(target)
    assert out.column("size").null_count == 2
    assert out.column("n").type == pa.int64()
    # zero-copy fast path: already-matching table returned as-is
    assert normalize_table(out, target) is out
