"""Type registry, widening lattice, and schema-compatibility rules.

Re-expresses the reference's EDM -> CDAP schema mapping
(``reference src/main/java/io/cdap/plugin/sap/SapODataSource.java:146-213``)
as an EDM -> pyarrow registry, and generalizes its user-schema
compatibility validation (``SapODataConfig.java:262-298``,
``validateFieldsMatch``: every provided field must exist, match on
type/logical type, and must not relax non-nullability) into the
schema-evolution kernel of the CDC engine: *add-column* (fill null) and
*type-widening* (int32->int64, float32->float64, decimal scale-up) are
legal; anything else is rejected with the reference's error shape.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# EDM -> pyarrow registry (SURVEY.md §1.3; SapODataSource.java:146-213)
# ---------------------------------------------------------------------------

_STREAM_TYPE = pa.struct(
    [
        pa.field("mediaEtag", pa.string()),
        pa.field("mediaContentType", pa.string()),
        pa.field("mediaReadLink", pa.string()),
        pa.field("mediaEditLink", pa.string()),
    ]
)

_POINT_TYPE = pa.struct(
    [
        pa.field("dimension", pa.string()),
        pa.field("x", pa.float64()),
        pa.field("y", pa.float64()),
        pa.field("z", pa.float64()),
    ]
)

_LINESTRING_TYPE = pa.struct(
    [
        pa.field("type", pa.string()),
        pa.field("dimension", pa.string()),
        pa.field("coordinates", pa.list_(_POINT_TYPE)),
    ]
)

_POLYGON_TYPE = pa.struct(
    [
        pa.field("type", pa.string()),
        pa.field("dimension", pa.string()),
        pa.field("exterior", pa.list_(_POINT_TYPE)),
        pa.field("interior", pa.list_(_LINESTRING_TYPE)),
        pa.field("numberOfInteriorRings", pa.int32()),
    ]
)

# MultiLineString / MultiPolygon: {type, dimension, coordinates:list<...>}
# (SapODataConstants.java:159-179)
_MULTILINESTRING_TYPE = pa.struct(
    [
        pa.field("type", pa.string()),
        pa.field("dimension", pa.string()),
        pa.field("coordinates", pa.list_(_LINESTRING_TYPE)),
    ]
)

_MULTIPOLYGON_TYPE = pa.struct(
    [
        pa.field("type", pa.string()),
        pa.field("dimension", pa.string()),
        pa.field("coordinates", pa.list_(_POLYGON_TYPE)),
    ]
)

# GeospatialCollection: members bucketized by shape; nested collections
# are unsupported because metadata carries no component info
# (SapODataConstants.java:191-211, comment :209)
_COLLECTION_TYPE = pa.struct(
    [
        pa.field("type", pa.string()),
        pa.field("dimension", pa.string()),
        pa.field("points", pa.list_(_POINT_TYPE)),
        pa.field("lineStrings", pa.list_(_LINESTRING_TYPE)),
        pa.field("polygons", pa.list_(_POLYGON_TYPE)),
        pa.field("multiPoints", pa.list_(_LINESTRING_TYPE)),
        pa.field("multiLineStrings", pa.list_(_MULTILINESTRING_TYPE)),
        pa.field("multiPolygons", pa.list_(_MULTIPOLYGON_TYPE)),
    ]
)


def edm_to_arrow(edm_type: str, precision: int = 38, scale: int = 9) -> pa.DataType:
    """Map an EDM type name to its pyarrow type (SapODataSource.java:146-213).

    Unknown types raise ``ValueError``, mirroring the reference's
    ``InvalidStageException`` for unsupported property types
    (``SapODataSource.java:208-212``).
    """
    t = edm_type.removeprefix("Edm.")
    simple = {
        "Binary": pa.binary(),
        "Boolean": pa.bool_(),
        "Byte": pa.int32(),
        "SByte": pa.int32(),
        "Int16": pa.int32(),
        "Int32": pa.int32(),
        "Int64": pa.int64(),
        "Single": pa.float32(),
        "Double": pa.float64(),
        "String": pa.string(),
        "Guid": pa.string(),
        # DateTimeOffset kept as string to preserve the zone offset, like the
        # reference (SapODataSource.java:158-160, docs/SapEcc-batchsource.md:61)
        "DateTimeOffset": pa.string(),
        # Duration kept as ISO-8601 string (SapODataSource.java:202-203)
        "Duration": pa.string(),
        "DateTime": pa.timestamp("us"),
        "Date": pa.timestamp("us"),
        "Time": pa.time64("us"),
        "TimeOfDay": pa.time64("us"),
        "Stream": _STREAM_TYPE,
        "GeographyPoint": _POINT_TYPE,
        "GeometryPoint": _POINT_TYPE,
        "GeographyLineString": _LINESTRING_TYPE,
        "GeometryLineString": _LINESTRING_TYPE,
        "GeographyMultiPoint": _LINESTRING_TYPE,
        "GeometryMultiPoint": _LINESTRING_TYPE,
        "GeographyPolygon": _POLYGON_TYPE,
        "GeometryPolygon": _POLYGON_TYPE,
        "GeographyMultiLineString": _MULTILINESTRING_TYPE,
        "GeometryMultiLineString": _MULTILINESTRING_TYPE,
        "GeographyMultiPolygon": _MULTIPOLYGON_TYPE,
        "GeometryMultiPolygon": _MULTIPOLYGON_TYPE,
        "GeographyCollection": _COLLECTION_TYPE,
        "GeometryCollection": _COLLECTION_TYPE,
    }
    if t in simple:
        return simple[t]
    if t == "Decimal":
        return pa.decimal128(precision, scale)
    raise ValueError(f"Unsupported property type '{edm_type}'")


# ---------------------------------------------------------------------------
# Widening lattice + compatibility (SapODataConfig.java:262-298 generalized)
# ---------------------------------------------------------------------------

_WIDENINGS: dict[tuple[pa.DataType, pa.DataType], bool] = {}


def is_widening(src: pa.DataType, dst: pa.DataType) -> bool:
    """True iff ``src`` can be losslessly widened to ``dst``.

    The lattice: int32->int64, float32->float64, int32->float64 (exact for
    32-bit ints), decimal(p,s)->decimal(p'>=p, s) and scale-up with matching
    integer-digit headroom, string->large_string, binary->large_binary.
    """
    if src.equals(dst):
        return True
    if pa.types.is_int32(src):
        return pa.types.is_int64(dst) or pa.types.is_float64(dst)
    if pa.types.is_float32(src):
        return pa.types.is_float64(dst)
    if pa.types.is_decimal(src) and pa.types.is_decimal(dst):
        return (
            dst.scale >= src.scale
            and (dst.precision - dst.scale) >= (src.precision - src.scale)
        )
    if pa.types.is_string(src) and pa.types.is_large_string(dst):
        return True
    if pa.types.is_binary(src) and pa.types.is_large_binary(dst):
        return True
    return False


class SchemaCompatError(ValueError):
    """Raised when a provided/evolved schema violates the compat rules.

    Message shape mirrors the reference's field-level errors
    (``SapODataConfig.java:262-298``).
    """


def validate_evolution(base: pa.Schema, evolved: pa.Schema) -> None:
    """Validate that ``evolved`` is a legal evolution of ``base``.

    Rules (generalizing ``SapODataConfig.java:262-298`` validateFieldsMatch):
      * every base field must still exist in ``evolved`` (no drops);
      * its type must be identical or a legal widening (:func:`is_widening`);
      * nullability must not be relaxed: a field the base declares
        non-nullable must stay non-nullable;
      * brand-new fields are allowed (add-column) but must be nullable.
    """
    errors: list[str] = []
    base_names = set(base.names)
    for f in base:
        if f.name not in evolved.names:
            errors.append(f"Field '{f.name}' was dropped by the evolved schema")
            continue
        g = evolved.field(f.name)
        if not is_widening(f.type, g.type):
            errors.append(
                f"Field '{f.name}' of type '{g.type}' is not compatible with "
                f"base type '{f.type}'"
            )
        if not f.nullable and g.nullable:
            # rule 3 of the reference's validateFieldsMatch
            # (SapODataConfig.java:262-298): a provided/evolved schema may
            # not relax a non-nullable base field to nullable
            errors.append(
                f"Field '{f.name}' must not relax the base schema's "
                "non-nullability"
            )
    for g in evolved:
        if g.name not in base_names and not g.nullable:
            errors.append(f"Added field '{g.name}' must be nullable")
    if errors:
        raise SchemaCompatError("; ".join(errors))


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Compute the unified target schema over evolving versions.

    Fields are kept in first-seen order; each field's type is the widest
    seen (via :func:`is_widening`); fields absent from some version become
    nullable (add-column fill-null semantics, O-CDC3).
    """
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    nullable: dict[str, bool] = {}
    seen_in: dict[str, int] = {}
    for s in schemas:
        for f in s:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
                nullable[f.name] = f.nullable
                seen_in[f.name] = 1
            else:
                seen_in[f.name] += 1
                cur = types[f.name]
                if is_widening(cur, f.type):
                    types[f.name] = f.type
                elif not is_widening(f.type, cur):
                    raise SchemaCompatError(
                        f"Field '{f.name}' of type '{f.type}' is not compatible "
                        f"with base type '{cur}'"
                    )
                nullable[f.name] = nullable[f.name] or f.nullable
    n = len(schemas)
    return pa.schema(
        [
            pa.field(name, types[name], nullable[name] or seen_in[name] < n)
            for name in order
        ]
    )


def normalize_table(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``target``: add missing columns as nulls, widen types.

    This is the per-batch kernel of the schema-evolution normalizer
    (O-CDC3); it is zero-copy when the batch already matches the target.
    """
    if table.schema.equals(target):
        return table
    n = table.num_rows
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=target)
