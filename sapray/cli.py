"""Command-line entry point — the ``ray job submit`` surface.

    python -m sapray.cli apply --changelog DIR --lake DIR [options]
    python -m sapray.cli compact --lake DIR [--partitions 0,1,2]
    python -m sapray.cli state --lake DIR [--limit N] [--as-of W]
    python -m sapray.cli lookup --lake DIR --key repo=r1,path=a/b [--as-of W]
    python -m sapray.cli changes --lake DIR [--since W] [--until W2]

On a cluster this module is the job driver: ``ray job submit --
python -m sapray.cli apply ...`` (the job connects to the cluster's
existing Ray; locally it starts a local session). This is the ONLY
module besides bench.py/tests that owns a Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


_OWNS_RAY = False


def _init_ray(num_cpus: int | None) -> None:
    import ray

    global _OWNS_RAY
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
        _OWNS_RAY = True


def cmd_apply(args: argparse.Namespace) -> int:
    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    _init_ray(args.num_cpus)
    cfg = CDCConfig(
        lake_dir=args.lake,
        num_partitions=args.partitions,
        sink_mode=args.sink_mode,
        winner_strategy=args.strategy,
        amplification=args.amplification,
    )
    eng = CDCEngine(cfg)
    summary = eng.apply(args.changelog, resume=not args.no_resume)
    summary.pop("per_partition", None)
    print(json.dumps(summary))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    from sapray.sink import compact_partition, read_manifests

    parts = (
        [int(p) for p in args.partitions.split(",")]
        if args.partitions
        else sorted(read_manifests(args.lake))
    )
    key_columns = tuple(args.key_columns.split(","))
    done = 0
    for p in parts:
        m = compact_partition(args.lake, p, key_columns, args.seq_column)
        if m is not None:
            done += 1
    print(json.dumps({"compacted": done, "partitions": len(parts)}))
    return 0


def _report(ds, limit: int) -> None:
    out = {"rows": ds.count()}
    if limit:
        out["sample"] = [
            {k: v for k, v in r.items() if k != "content"}
            for r in ds.take(limit)
        ]
    print(json.dumps(out, default=str))


def cmd_state(args: argparse.Namespace) -> int:
    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    _init_ray(args.num_cpus)
    eng = CDCEngine(CDCConfig(lake_dir=args.lake))
    _report(eng.state_dataset(as_of=args.as_of), args.limit)
    return 0


def cmd_lookup(args: argparse.Namespace) -> int:
    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    # --key is repeatable; a single occurrence may hold comma-separated
    # pairs IF every token is exactly identifier=value with a single '='
    # (a value containing ',' or '=' needs one --key per column; the old
    # any-'='-works heuristic silently split values like path=a=1,b=2
    # into two columns — ADVICE r2). Key-column ORDER comes from the
    # lake's manifests inside point_lookup, never from argument order —
    # the key hash is order-dependent.
    import re as _re

    pair = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*=[^=]*$")
    key: dict[str, str] = {}
    for occurrence in args.key:
        tokens = (
            occurrence.split(",")
            if all(pair.match(t) for t in occurrence.split(","))
            else [occurrence]
        )
        for t in tokens:
            if "=" not in t:
                raise SystemExit(
                    f"--key entry {t!r} is not col=value; pass one --key "
                    "per column when a value contains ','"
                )
            c, v = t.split("=", 1)
            key[c] = v
    eng = CDCEngine(CDCConfig(lake_dir=args.lake))
    t = eng.point_lookup(key, as_of=args.as_of)
    print(json.dumps(
        {"rows": t.num_rows,
         "sample": [
             {k: v for k, v in r.items() if k != "content"}
             for r in t.to_pylist()
         ]},
        default=str,
    ))
    return 0


def cmd_changes(args: argparse.Namespace) -> int:
    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    _init_ray(args.num_cpus)
    eng = CDCEngine(CDCConfig(lake_dir=args.lake))
    _report(eng.changes_dataset(since=args.since, until=args.until), args.limit)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sapray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("apply", help="replay a change log into the lake")
    a.add_argument("--changelog", required=True)
    a.add_argument("--lake", required=True)
    a.add_argument("--partitions", type=int, default=64)
    a.add_argument("--sink-mode", choices=["snapshot", "delta"], default="snapshot")
    a.add_argument("--strategy", choices=["broadcast", "shuffle"], default="broadcast")
    a.add_argument("--amplification", type=int, default=1)
    a.add_argument("--no-resume", action="store_true")
    a.add_argument("--num-cpus", type=int, default=None)
    a.set_defaults(fn=cmd_apply)

    c = sub.add_parser("compact", help="fold delta files into snapshots")
    c.add_argument("--lake", required=True)
    c.add_argument("--partitions", default=None, help="comma-separated ids (default: all)")
    c.add_argument("--key-columns", default="repo,path",
                   help="comma-separated upsert key columns (must match the apply config)")
    c.add_argument("--seq-column", default="seq")
    c.set_defaults(fn=cmd_compact)

    st = sub.add_parser("state", help="inspect the committed lake")
    st.add_argument("--lake", required=True)
    st.add_argument("--limit", type=int, default=0)
    st.add_argument("--as-of", type=int, default=None, dest="as_of",
                    help="time-travel a delta-mode lake to this commit watermark")
    st.add_argument("--num-cpus", type=int, default=None)
    st.set_defaults(fn=cmd_state)

    lk = sub.add_parser(
        "lookup", help="point lookup of one key via manifest zone maps (no Ray session)"
    )
    lk.add_argument("--lake", required=True)
    lk.add_argument("--key", required=True, action="append",
                    help="col=value (repeatable; one occurrence may hold "
                         "comma-separated pairs, e.g. repo=r1,path=a/b)")
    lk.add_argument("--as-of", type=int, default=None, dest="as_of")
    lk.set_defaults(fn=cmd_lookup)

    ch = sub.add_parser(
        "changes", help="change-data-feed of a delta-mode lake"
    )
    ch.add_argument("--lake", required=True)
    ch.add_argument("--since", type=int, default=-1,
                    help="exclusive lower seq bound (a commit watermark)")
    ch.add_argument("--until", type=int, default=None,
                    help="inclusive upper seq bound (default: current)")
    ch.add_argument("--limit", type=int, default=0)
    ch.add_argument("--num-cpus", type=int, default=None)
    ch.set_defaults(fn=cmd_changes)

    args = ap.parse_args(argv)
    rc = args.fn(args)
    # only tear down a session this process created (in-process callers —
    # tests, notebooks — keep theirs)
    import ray

    if _OWNS_RAY and ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
