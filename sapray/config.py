"""Pipeline configuration + accumulated validation.

Analogue of the reference's ``SapODataConfig``
(``reference src/main/java/io/cdap/plugin/sap/SapODataConfig.java:193-250``):
required-field checks, identifier charset rule, query sanitization
(leading-``?`` strip, ``SapODataConfig.java:122-134``) and ``$select``
parsing (``:144-155``) — all errors are *accumulated* then raised at once,
mirroring the CDAP ``FailureCollector`` pattern.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class ConfigError(ValueError):
    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("; ".join(errors))


_ID_RE = re.compile(r"^[A-Za-z0-9_.$-]+$")


def sanitize_query(query: str | None) -> str:
    """Strip leading '?' characters from a user query string
    (SapODataConfig.java:122-134)."""
    if not query:
        return ""
    return query.lstrip("?")


def parse_select(query: str) -> list[str]:
    """Extract the ``$select`` column list from a sanitized query string,
    order preserved (SapODataConfig.java:144-155)."""
    q = sanitize_query(query)
    for part in q.split("&"):
        if part.startswith("$select="):
            cols = part[len("$select=") :]
            return [c.strip() for c in cols.split(",") if c.strip()]
    return []


def parse_top_skip(query: str) -> tuple[int | None, int | None]:
    """Extract ``$top``/``$skip`` limits from a sanitized query string —
    the reference treats ``$top=2&$skip=2`` as a first-class query shape
    (``reference src/test/java/io/cdap/plugin/sap/SapODataConfigTest.java:59``).
    Returns (top, skip), each None when absent; malformed or negative
    values are accumulated into one ConfigError (FailureCollector
    pattern). Execution maps (top, skip) onto ``ops.topk`` / ``ops.skip``.
    """
    q = sanitize_query(query)
    top: int | None = None
    skip: int | None = None
    errors: list[str] = []
    for part in q.split("&"):
        for name in ("$top", "$skip"):
            if part.startswith(name + "="):
                raw = part[len(name) + 1 :]
                try:
                    val = int(raw)
                    if val < 0:
                        raise ValueError
                except ValueError:
                    errors.append(
                        f"'{name}' must be a non-negative integer, got {raw!r}"
                    )
                    continue
                if name == "$top":
                    top = val
                else:
                    skip = val
    if errors:
        raise ConfigError(errors)
    return top, skip


@dataclass
class CDCConfig:
    """Configuration for a CDC apply run.

    Crosses the driver->worker boundary as a plain dataclass captured in
    task closures (the reference ships its config as JSON in the Hadoop
    ``Configuration``, ``ODataEntryInputFormatProvider.java:29-50``).
    """

    reference_name: str = "sapray-cdc"
    lake_dir: str = "/tmp/sapray/lake"
    num_partitions: int = 64
    # skew handling (O-CDC4): keys whose observed event share exceeds
    # hot_key_threshold of a sample are salted into `num_salts` sub-groups
    num_salts: int = 8
    hot_key_threshold: float = 0.01
    hot_key_sample: int = 100_000
    # execution
    batch_size: int = 32_768
    skinny_batch_size: int = 262_144  # pass-1 rows are ~40 B each
    apply_concurrency: int | None = None  # None -> let Ray size the pool
    # two-pass winner-broadcast plan (pipeline.py module docstring):
    # "broadcast" resolves winners over skinny columns then routes only
    # winning payload rows; "shuffle" is the single-pass full-row
    # exchange, used automatically when the winner set exceeds the limit
    winner_strategy: str = "broadcast"
    winner_broadcast_limit: int = 100_000_000
    # sink mode: "snapshot" rewrites the full partition every apply
    # (read-optimized); "delta" appends winner deltas + tombstones and
    # merges on read, compacting when a partition accumulates
    # compact_every files (write-optimized incremental ingest)
    sink_mode: str = "snapshot"
    compact_every: int = 8
    # in-flight row multiplication (10^10-scale proxy, changelog.amplify_batch):
    # every stage processes amplification x the on-disk events, with
    # disjoint key spaces per replica
    amplification: int = 1
    # query pushdown (M16-M18)
    query: str = ""
    key_columns: tuple[str, ...] = ("repo", "path")
    seq_column: str = "seq"
    op_column: str = "op"
    extra_errors: list[str] = field(default_factory=list, repr=False)

    def validate(self) -> None:
        errors: list[str] = list(self.extra_errors)
        if not self.reference_name:
            errors.append("Reference Name must be specified")
        elif not _ID_RE.match(self.reference_name):
            errors.append(
                f"Invalid reference name '{self.reference_name}': must contain "
                "only letters, numbers, and '_', '-', '.', or '$'"
            )
        if not self.lake_dir:
            errors.append("Lake directory must be specified")
        if self.num_partitions <= 0:
            errors.append("num_partitions must be positive")
        if self.num_salts <= 0:
            errors.append("num_salts must be positive")
        if not (0.0 < self.hot_key_threshold <= 1.0):
            errors.append("hot_key_threshold must be in (0, 1]")
        if self.batch_size <= 0:
            errors.append("batch_size must be positive")
        if not self.key_columns:
            errors.append("key_columns must be non-empty")
        if self.winner_strategy not in ("broadcast", "shuffle"):
            errors.append("winner_strategy must be 'broadcast' or 'shuffle'")
        if self.amplification < 1:
            errors.append("amplification must be >= 1")
        if self.sink_mode not in ("snapshot", "delta"):
            errors.append("sink_mode must be 'snapshot' or 'delta'")
        if self.compact_every < 2:
            errors.append("compact_every must be >= 2")
        if errors:
            raise ConfigError(errors)

    @property
    def select_columns(self) -> list[str]:
        return parse_select(self.query)
