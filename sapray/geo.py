"""Geospatial extraction (M12): the 7 OData shapes as Arrow structs.

Re-expresses the reference's largest transform block — the per-shape
geospatial extractors of ``reference
src/main/java/io/cdap/plugin/sap/transformer/ODataEntryToRecordTransformer.java:175-323``
(dispatch ``:175-197``, collection bucketizer ``:199-239``, point
``:241-248``, line ``:250-262``, polygon ``:264-281``, multipoint
``:283-295``, multiline ``:297-309``, multipolygon ``:311-323``) — over
GeoJSON-style wire values (the engine's stand-in for Olingo
``Geospatial`` objects): ``{"type": "Point", "coordinates": [x, y, z?],
"dimension": "GEOMETRY"|"GEOGRAPHY"}``.

Output layouts are field-for-field the reference's record schemas
(``SapODataConstants.java:91-211``): LineString and MultiPoint share a
shape disambiguated by the ``type`` field; Polygon carries
exterior/interior rings + ring count; the Collection bucketizes members
by shape and silently skips nested collections (metadata carries no
component info, ``SapODataConstants.java:209``).

Decode is per-row Python over small geo payloads (the reference is
per-row too) wrapped in ``map_batches``; the emitted struct arrays are
typed with the §1.3 registry so downstream stages stay Arrow-native.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from sapray.schema import edm_to_arrow

_DEFAULT_DIMENSION = "GEOMETRY"


def _point(coords, dimension: str) -> dict:
    x = float(coords[0]) if len(coords) > 0 else 0.0
    y = float(coords[1]) if len(coords) > 1 else 0.0
    z = float(coords[2]) if len(coords) > 2 else 0.0
    return {"dimension": dimension, "x": x, "y": y, "z": z}


def _linestring(coords, dimension: str, type_name: str = "LineString") -> dict:
    return {
        "type": type_name,
        "dimension": dimension,
        "coordinates": [_point(c, dimension) for c in coords],
    }


def _polygon(rings, dimension: str) -> dict:
    exterior = [_point(c, dimension) for c in (rings[0] if rings else [])]
    interior = [_linestring(r, dimension) for r in rings[1:]]
    return {
        "type": "Polygon",
        "dimension": dimension,
        "exterior": exterior,
        "interior": interior,
        "numberOfInteriorRings": len(interior),
    }


def _multilinestring(coords, dimension: str) -> dict:
    return {
        "type": "MultiLineString",
        "dimension": dimension,
        "coordinates": [_linestring(ls, dimension) for ls in coords],
    }


def _multipolygon(coords, dimension: str) -> dict:
    return {
        "type": "MultiPolygon",
        "dimension": dimension,
        "coordinates": [_polygon(p, dimension) for p in coords],
    }


def extract_geospatial(value: dict | str | None) -> dict | None:
    """Decode ONE GeoJSON-style value to the reference's record layout.

    Dispatch mirrors ``extractGeospatial``
    (``…Transformer.java:175-197``); unknown shape names raise with the
    reference's message shape.
    """
    if value is None:
        return None
    if isinstance(value, str):
        value = json.loads(value)
        if value is None:
            return None  # JSON text 'null' == missing geometry
    if not isinstance(value, dict):
        raise ValueError(
            f"Field is of unsupported geospatial type '{type(value).__name__}'."
        )
    dimension = value.get("dimension", _DEFAULT_DIMENSION)
    shape = value.get("type")
    coords = value.get("coordinates", [])
    if shape == "Point":
        return _point(coords, dimension)
    if shape == "LineString":
        return _linestring(coords, dimension)
    if shape == "Polygon":
        return _polygon(coords, dimension)
    if shape == "MultiPoint":
        return _linestring(coords, dimension, type_name="MultiPoint")
    if shape == "MultiLineString":
        return _multilinestring(coords, dimension)
    if shape == "MultiPolygon":
        return _multipolygon(coords, dimension)
    if shape in ("GeometryCollection", "GeographyCollection"):
        return _collection(value, dimension, type_name=shape)
    raise ValueError(f"Field is of unsupported geospatial type '{shape}'.")


_COLLECTION_BUCKETS = {
    "Point": ("points", _point),
    "LineString": ("lineStrings", _linestring),
    "Polygon": ("polygons", _polygon),
    "MultiPoint": ("multiPoints", lambda c, d: _linestring(c, d, "MultiPoint")),
    "MultiLineString": ("multiLineStrings", _multilinestring),
    "MultiPolygon": ("multiPolygons", _multipolygon),
}


def _collection(
    value: dict, dimension: str, type_name: str = "GeometryCollection"
) -> dict:
    """Bucketize collection members by shape
    (``…Transformer.java:199-239``); nested collections are skipped like
    the reference's switch without a collection case. ``type_name``
    preserves the INPUT shape name (a GeographyCollection must not be
    re-labelled GeometryCollection — review finding)."""
    out = {
        "type": type_name,
        "dimension": dimension,
        "points": [],
        "lineStrings": [],
        "polygons": [],
        "multiPoints": [],
        "multiLineStrings": [],
        "multiPolygons": [],
    }
    for member in value.get("geometries", []):
        bucket = _COLLECTION_BUCKETS.get(member.get("type"))
        if bucket is None:
            continue  # nested collections unsupported
        name, fn = bucket
        mdim = member.get("dimension", dimension)
        out[name].append(fn(member.get("coordinates", []), mdim))
    return out


# shape name -> EDM type whose Arrow struct this shape decodes into
_SHAPE_EDM = {
    "Point": "Edm.GeometryPoint",
    "LineString": "Edm.GeometryLineString",
    "Polygon": "Edm.GeometryPolygon",
    "MultiPoint": "Edm.GeometryMultiPoint",
    "MultiLineString": "Edm.GeometryMultiLineString",
    "MultiPolygon": "Edm.GeometryMultiPolygon",
    "Collection": "Edm.GeometryCollection",
}


def decode_geo_column(
    col: pa.ChunkedArray | pa.Array, shape: str
) -> pa.Array:
    """Decode a column of GeoJSON strings/dicts into the typed struct
    array for ``shape`` (one of ``_SHAPE_EDM``)."""
    arrow_type = edm_to_arrow(_SHAPE_EDM[shape])
    values = [extract_geospatial(v) for v in col.to_pylist()]
    return pa.array(values, type=arrow_type)


def decode_geo_batches(
    ds: ray.data.Dataset, columns: dict[str, str]
) -> ray.data.Dataset:
    """map_batches stage decoding each named GeoJSON column to its typed
    struct (``columns``: column name -> shape name)."""

    def f(batch: pa.Table) -> pa.Table:
        for name, shape in columns.items():
            idx = batch.column_names.index(name)
            batch = batch.set_column(
                idx, name, decode_geo_column(batch.column(name), shape)
            )
        return batch

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
