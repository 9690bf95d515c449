"""Non-parquet file sources: line-delimited JSON and CSV.

The reference is a *source connector* whose job is (a) reading an
external representation into records and (b) validating the data's
inferred schema against the schema the user declared
(`SapODataConfig.validateFieldsMatch`, SapODataConfig.java:262-298 —
see SURVEY.md §1.2). These readers are the file-format analogs: Ray
Data's native Arrow readers do the scan (streaming, per-file
parallelism), and an optional ``expected_schema`` applies the same
compatibility rules the CDC path uses for schema evolution
(:func:`sapray.schema.validate_evolution`): no dropped columns, no type
changes outside the widening lattice, no nullability relaxation.

Column pruning happens at the read where the format allows it (CSV
reads only the requested columns via Arrow's convert options); JSONL is
a row-oriented format, so projection is applied immediately after parse
— the bytes are read but never leave the first map stage.

Scale notes: both readers inherit Ray Data's per-file read tasks — shard
large exports into many files (the writers below do). For repeated
analytics over the same data, convert to parquet once and use
``ops.read_projected``; these sources are for ingest, not for hot loops.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from sapray.schema import validate_evolution


def _guard(ds: ray.data.Dataset, expected_schema: pa.Schema | None) -> ray.data.Dataset:
    """validateFieldsMatch analog: the EXPECTED schema must be readable
    from the INFERRED one under the engine's evolution rules (reading
    inferred data as the expected shape loses nothing and widens only
    along the lattice)."""
    if expected_schema is not None:
        inferred = pa.schema(
            [pa.field(n, t) for n, t in zip(ds.schema().names, ds.schema().types)]
        )
        validate_evolution(expected_schema, inferred)
    return ds


def read_jsonl(
    path: str | list[str],
    columns: list[str] | None = None,
    expected_schema: pa.Schema | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Line-delimited JSON source (Arrow's NDJSON reader per file).

    JSON carries no column index, so ``columns`` prunes right after
    parse instead of at the byte scan — still before the first exchange.
    """
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = ray.data.read_json(path, **kwargs)
    ds = _guard(ds, expected_schema)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_csv(
    path: str | list[str],
    columns: list[str] | None = None,
    expected_schema: pa.Schema | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """CSV source. ``columns`` is pushed into Arrow's convert options so
    non-requested columns are never materialized."""
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if columns:
        from pyarrow.csv import ConvertOptions

        kwargs["convert_options"] = ConvertOptions(include_columns=columns)
    ds = ray.data.read_csv(path, **kwargs)
    return _guard(ds, expected_schema)


def write_jsonl(ds: ray.data.Dataset, path: str) -> None:
    """Line-delimited JSON sink (one file per block — resumable layout,
    never one giant file)."""
    ds.write_json(path)


def write_csv(ds: ray.data.Dataset, path: str) -> None:
    """CSV sink (one file per block)."""
    ds.write_csv(path)
