"""Incremental materialized-view maintenance (IVM) over the change feed.

The canonical consumer of a CDC change feed: a grouped-aggregate view
``V_a = agg(state(as_of=a))`` is advanced to watermark ``b`` WITHOUT
rescanning or re-aggregating the lake:

    V_b  =  V_a  (+)  agg(additions)  (-)  agg(retractions)

* The feed is first LWW-reduced to ONE row per key (a window spanning
  several commits carries one post-image per touched commit; only the
  final one is the key's state at ``b``, and the single pre-image
  retraction must pair with exactly one addition).
* ``additions``   — the surviving upsert rows (post-images).
* ``retractions`` — the ``state(as_of=a)`` rows whose key appears in the
  feed. The delta sink stores post-images only (appliers never read
  prior state), so pre-images are recovered with a broadcast of the
  feed's key set and a ``pc.is_in`` filter over the old state — no
  shuffle.

Scale contract: the feed window between two view refreshes is small
relative to the lake (that is the point of incremental maintenance), so
its key set broadcasts; the old state is only *scanned and filtered*,
never shuffled, and each side pre-aggregates per batch before the tiny
per-group exchange (`ops.grouped_aggregate`). A cold refresh (no
``base_partials``) computes the base aggregate AND the retractions in
ONE pass over the old state (masked-column partials), so the lake is
merge-on-read-scanned exactly once. Self-decomposable aggregates are
``count`` / ``sum`` / ``mean`` (mean via sum+count); ``min``/``max`` —
not subtractable (a retraction can remove the extreme) — maintain via
the standard IVM fallback, AFFECTED-GROUP partial re-aggregation: one
broadcast-filtered scan of the new state re-aggregates only touched
groups, every other group keeps its base extreme. Groups whose row
count reaches zero are dropped, matching SQL ``GROUP BY`` over the new
state.

The reference has no IVM analog (it implements no aggregations at all —
``SapODataSource.java`` is a source + per-record transform); this
operator exists because the engine's north rule is a CDC lake, and a
maintained aggregate is what such feeds are for.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from sapray.ops import AggSpec, _cached_broadcast, grouped_aggregate, semi_join_filter

_KEY = "__ivm_key"


def _decompose(spec: AggSpec) -> AggSpec:
    """count/sum partials for the requested aggregates (mean -> both)."""
    out: AggSpec = {}
    for name, (col, kind) in spec.items():
        if kind == "count":
            out[name] = (None, "count")
        elif kind == "sum":
            # SQL SUM over zero non-null values is NULL, not 0 — the
            # valid count decides at finalize; in the merge arithmetic a
            # null partial is a 0 contribution (fillna below)
            out[name] = (col, "sum")
            out[f"__vcnt_{name}"] = (col, "count_valid")
        elif kind == "mean":
            # SQL AVG divides by the value column's NON-NULL count, not
            # the row count — carry a per-column valid-count partial
            # (mirrors ops.grouped_aggregate's count_valid fix; a shared
            # __n divisor silently deflated means over nullable columns)
            out[f"__sum_{name}"] = (col, "sum")
            out[f"__vcnt_{name}"] = (col, "count_valid")
        else:
            raise ValueError(
                f"aggregate {kind!r} is not incrementally maintainable "
                "(self-decomposable count/sum/mean only)"
            )
    # a row-count partial is always carried to drop emptied groups
    out.setdefault("__n", (None, "count"))
    return out


def _finalize(
    df: pd.DataFrame, spec: AggSpec, group: str, minmax: AggSpec | None = None
) -> pa.Table:
    df = df[df["__n"] > 0]
    cols: dict[str, object] = {group: df[group]}
    for name, (col, kind) in spec.items():
        if kind == "count":
            cols[name] = df[name].astype("int64")
        elif kind == "sum":
            vcnt = df[f"__vcnt_{name}"]
            s = df[name]
            if (vcnt <= 0).any():
                # an all-null group's SUM is NULL: integer sums null via
                # pandas nullable Int64 so the Arrow schema stays int64
                # across refreshes (floatifying would make the same view
                # return int64 on one refresh and float64 on the next)
                if pd.api.types.is_integer_dtype(s):
                    s = s.astype("Int64").where(vcnt > 0)
                else:
                    s = s.where(vcnt > 0)
            cols[name] = s
        else:  # mean — NULL (not 0/0) when the group has no non-null value
            vcnt = df[f"__vcnt_{name}"].astype("float64").replace(0.0, np.nan)
            cols[name] = df[f"__sum_{name}"] / vcnt
    for name in (minmax or {}):
        cols[name] = df[f"__mm__{name}"]
    return pa.Table.from_pydict({k: pa.array(v) for k, v in cols.items()})


def _base_and_retractions(
    eng,
    group: str,
    partials: AggSpec,
    feed_keys: pa.Array,
    since: int,
    prepare,
    minmax: AggSpec | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """ONE pass over state(as_of=since) producing both the base partials
    and the retraction partials: each per-row source column is summed
    twice, once unmasked and once masked to feed-key rows. ``minmax``
    aggregates ride the same pass as direct (unmasked) min/max columns."""
    import pyarrow.compute as pc

    from sapray.hashing import composite_key

    key_cols = eng.cfg.key_columns
    ref = ray.put(feed_keys)

    sum_spec: AggSpec = {}
    for name in partials:
        sum_spec[name] = (f"__row_{name}", "sum")
        sum_spec[f"__ret__{name}"] = (f"__ret_row_{name}", "sum")
    for name, (col, kind) in (minmax or {}).items():
        sum_spec[f"__mm__{name}"] = (col, kind)

    def expand(batch: pa.Table) -> pa.Table:
        ks = _cached_broadcast(ref, lambda k: k)
        in_feed = pc.is_in(composite_key(batch, key_cols), value_set=ks)
        for name, (col, kind) in partials.items():
            if kind == "count":
                row = pa.array(np.ones(batch.num_rows, dtype=np.int64))
            elif kind == "count_valid":
                row = pc.cast(
                    pc.is_valid(batch.column(col).combine_chunks()), pa.int64()
                )
            else:
                row = batch.column(col).combine_chunks()
            batch = batch.append_column(f"__row_{name}", row)
            batch = batch.append_column(
                f"__ret_row_{name}",
                pc.if_else(in_feed, row, pa.scalar(0, type=row.type)),
            )
        return batch

    ds = eng.state_dataset(as_of=since)
    if prepare is not None:
        ds = prepare(ds)
    ds = ds.map_batches(expand, batch_format="pyarrow")
    df = grouped_aggregate(ds, [group], sum_spec).to_pandas()
    if df.empty and group not in df.columns:
        # an EMPTY base state (e.g. since=0 on a fresh lake) aggregates
        # to a column-less frame — rebuild the expected empty shape so
        # the selections below don't KeyError (review follow-up)
        df = pd.DataFrame({c: pd.Series(dtype="float64")
                           for c in (group, *sum_spec)})
    base = df[[group, *partials, *(f"__mm__{n}" for n in (minmax or {}))]]
    ret = df[[group, *(f"__ret__{n}" for n in partials)]].rename(
        columns={f"__ret__{n}": n for n in partials}
    )
    return base, ret


def incremental_group_view(
    eng,
    group: str,
    spec: AggSpec,
    since: int,
    until: int | None = None,
    base_partials: pd.DataFrame | None = None,
    prepare: Callable[[ray.data.Dataset], ray.data.Dataset] | None = None,
    minmax: AggSpec | None = None,
) -> tuple[pa.Table, pd.DataFrame]:
    """Advance the grouped view of ``eng``'s lake from watermark
    ``since`` to ``until`` using only the change feed + one filtered
    scan of the old state. ``prepare`` (optional) derives columns on
    both streams before aggregation (e.g. a length column). Returns
    ``(view, partials)``: the finalized view (one row per surviving
    group) and the count/sum partials to pass back as ``base_partials``
    on the next refresh — a chained refresh touches the OLD STATE only
    for pre-images, never to re-aggregate. When ``base_partials`` is
    omitted, base + retractions come from a single combined pass.

    ``minmax`` adds MIN/MAX aggregates, which are not self-decomposable
    (a retraction can remove the extreme): they maintain via the
    standard IVM fallback — AFFECTED-GROUP partial re-aggregation. The
    affected set (groups touched by additions or retractions — already
    known from the partials, no extra pass) is broadcast, and ONE
    filtered scan of the NEW state re-aggregates min/max for those
    groups only; every unaffected group keeps its base extreme. The
    filter runs on the RAW state (before ``prepare``) so the derived-
    column work only touches the affected slice — therefore ``prepare``
    must not create or transform the GROUP column; it may only add
    derived value columns.
    """
    import pyarrow.compute as pc

    from sapray.hashing import composite_key
    from sapray.partition import lww_reduce

    partials = _decompose(spec)
    mm = minmax or {}
    for name, (col, kind) in mm.items():
        if kind not in ("min", "max"):
            raise ValueError(f"minmax entry {name!r} must be min or max")
    mm_cols = [f"__mm__{n}" for n in mm]

    def check_mm_partials(bp: pd.DataFrame) -> None:
        missing = [c for c in mm_cols if c not in bp.columns]
        if missing:
            raise ValueError(
                "incremental_group_view: base_partials is missing min/max "
                f"partial columns {missing} — it was produced by a refresh "
                "without minmax=; recompute the base partials with the same "
                "minmax spec (a contract error, not a pandas KeyError)"
            )

    def check_partials(bp: pd.DataFrame) -> None:
        stale = [c for c in partials if c not in bp.columns]
        if stale:
            raise ValueError(
                "incremental_group_view: base_partials is missing partial "
                f"columns {stale} — it was produced by an older release "
                "(e.g. before AVG carried __vcnt_* valid-count partials); "
                "recompute the base partials with this release (a "
                "contract error, not a pandas KeyError)"
            )

    if base_partials is not None:
        # validate on EVERY path, including the empty-feed early return
        check_partials(base_partials)
        if mm:
            check_mm_partials(base_partials)

    def agg_df(ds: ray.data.Dataset, with_mm: bool = False) -> pd.DataFrame:
        if prepare is not None:
            ds = prepare(ds)
        s: AggSpec = dict(partials)
        if with_mm:
            s.update({f"__mm__{n}": (c, k) for n, (c, k) in mm.items()})
        return grouped_aggregate(ds, [group], s).to_pandas()

    feed = eng.changes_table(since=since, until=until)
    if feed.num_rows == 0:
        if base_partials is None:
            base_partials = agg_df(eng.state_dataset(as_of=since), with_mm=True)
        return _finalize(base_partials, spec, group, mm), base_partials

    # one row per key: only the final post-image is the key's state at
    # the window end; earlier intra-window images must not be counted
    key_cols = eng.cfg.key_columns
    feed = lww_reduce(feed, key_cols, eng.cfg.seq_column)
    feed_keys = composite_key(feed, key_cols)

    additions = feed.filter(pc.equal(feed.column("change_op"), "U"))
    add_df = agg_df(ray.data.from_arrow(additions)) if additions.num_rows else None

    if base_partials is None:
        base_partials, ret_df = _base_and_retractions(
            eng, group, partials, feed_keys, since, prepare, mm
        )
    else:

        def tag_keys(batch: pa.Table) -> pa.Table:
            return batch.append_column(_KEY, composite_key(batch, key_cols))

        retract_ds = semi_join_filter(
            eng.state_dataset(as_of=since).map_batches(
                tag_keys, batch_format="pyarrow"
            ),
            feed_keys,
            _KEY,
        ).drop_columns([_KEY])
        ret_df = agg_df(retract_ds)

    merged = base_partials.set_index(group)
    check_partials(base_partials)  # covers the single-pass path too
    if mm:
        check_mm_partials(base_partials)
    base_mm = merged[mm_cols] if mm else None
    merged = merged[list(partials)]
    numeric = list(merged.columns)
    orig_dtypes = {c: merged[c].dtype for c in numeric}
    # an all-null sum partial arrives as NaN (Arrow sum of no non-null
    # values is null); it contributes 0 to the arithmetic — the carried
    # __vcnt partial restores NULL at finalize when the count is 0
    def _fill0(df: pd.DataFrame) -> pd.DataFrame:
        # infer_objects: an all-null Arrow sum arrives as object dtype;
        # silence pandas' downcast FutureWarning by converting explicitly
        return df.fillna(0).infer_objects(copy=False)

    merged = _fill0(merged)
    if add_df is not None and len(add_df):
        merged = merged.add(_fill0(add_df.set_index(group)[numeric]), fill_value=0)
    if len(ret_df):
        merged = merged.sub(_fill0(ret_df.set_index(group)[numeric]), fill_value=0)
    # pandas .add/.sub with fill_value float-ifies int64 partials when
    # group indexes differ — restore integral dtypes so a CHAINED refresh
    # returns the same Arrow schema as a cold one (review finding; values
    # above 2^53 remain bounded by the float64 intermediate, inherent to
    # the pandas merge path)
    for c in numeric:
        if pd.api.types.is_integer_dtype(orig_dtypes[c]) and merged[c].dtype != orig_dtypes[c]:
            merged[c] = merged[c].round().astype(orig_dtypes[c])
    out = merged.reset_index()
    out = out[out["__n"] > 0].reset_index(drop=True)

    if mm:
        # affected groups: touched by an addition or a retraction — both
        # already known from the partials, no extra pass
        affected: set = set()
        if add_df is not None and len(add_df):
            affected |= set(add_df[group])
        if len(ret_df):
            affected |= set(ret_df[ret_df["__n"] > 0][group])
        new_mm = None
        if affected:
            # Ray's groupby keeps NULL group keys: None must not reach
            # sorted()/is_in (is_in never matches null) — route the null
            # group through an explicit is_null branch instead of
            # silently keeping a stale extreme (review finding)
            def _is_null_key(g) -> bool:
                return g is None or (isinstance(g, float) and np.isnan(g))

            null_affected = any(_is_null_key(g) for g in affected)
            non_null = [g for g in affected if not _is_null_key(g)]
            aref = ray.put(pa.array(sorted(non_null))) if non_null else None

            def only_affected(batch: pa.Table) -> pa.Table:
                col = batch.column(group)
                if aref is not None:
                    ks = _cached_broadcast(aref, lambda k: k)
                    m = pc.is_in(col, value_set=ks)
                    if null_affected:
                        m = pc.or_kleene(m, pc.is_null(col))
                else:  # only the null group was touched
                    m = pc.is_null(col)
                return batch.filter(pc.fill_null(m, False))

            # filter BEFORE prepare: the derived-column work must run
            # over the affected slice, not the whole lake (review finding)
            ds_new = eng.state_dataset(as_of=until).map_batches(
                only_affected, batch_format="pyarrow"
            )
            if prepare is not None:
                ds_new = prepare(ds_new)
            mm_spec: AggSpec = {
                f"__mm__{n}": (c, k) for n, (c, k) in mm.items()
            }
            new_mm = (
                grouped_aggregate(ds_new, [group], mm_spec)
                .to_pandas()
                .set_index(group)
            )
        final_mm = base_mm.drop(
            index=[g for g in affected if g in base_mm.index]
        )
        if new_mm is not None and len(new_mm):
            final_mm = pd.concat([final_mm, new_mm])
        out = out.set_index(group).join(final_mm).reset_index()

    return _finalize(out, spec, group, mm), out
