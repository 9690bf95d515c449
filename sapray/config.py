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
    order preserved (SapODataConfig.java:144-155). Values URL-decode
    like every other option (``_query_option``), so a canonically
    encoded ``$select=a%2Cb`` splits into two columns instead of one
    bogus name."""
    body = _query_option(query, "$select")
    if body is None:
        return []
    return [c.strip() for c in body.split(",") if c.strip()]


def parse_top_skip(query: str) -> tuple[int | None, int | None]:
    """Extract ``$top``/``$skip`` limits from a sanitized query string —
    the reference treats ``$top=2&$skip=2`` as a first-class query shape
    (``reference src/test/java/io/cdap/plugin/sap/SapODataConfigTest.java:59``).
    Returns (top, skip), each None when absent; malformed or negative
    values are accumulated into one ConfigError (FailureCollector
    pattern). Execution maps (top, skip) onto ``ops.topk`` / ``ops.skip``.
    """
    top: int | None = None
    skip: int | None = None
    errors: list[str] = []
    for name in ("$top", "$skip"):
        raw = _query_option(query, name)
        if raw is None:
            continue
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


def _decode(value: str) -> str:
    """URL-decode an option value (the reference's canonical query uses
    ``%27``-encoded quotes: ``$filter=BuyerName eq %27TECUM%27``,
    ``reference SapODataConfigTest.java:59``). ``unquote`` (not
    ``unquote_plus``): OData encodes spaces as %20, a literal ``+`` is
    data."""
    from urllib.parse import unquote

    return unquote(value)


def _query_option(query: str, name: str) -> str | None:
    q = sanitize_query(query)
    for part in q.split("&"):
        if part.startswith(name + "="):
            return _decode(part[len(name) + 1 :])
    return None


def parse_orderby(query: str) -> list[tuple[str, bool]]:
    """Compile the ``$orderby`` option (``$orderby=Field1 asc,Field2
    desc`` — passes through end to end per ``reference
    docs/SapEcc-batchsource.md:30-33``) into ``[(column, descending)]``,
    default ascending. Malformed items accumulate into one ConfigError
    (FailureCollector pattern)."""
    body = _query_option(query, "$orderby")
    if body is None:
        return []
    out: list[tuple[str, bool]] = []
    errors: list[str] = []
    for item in body.split(","):
        toks = item.strip().split()
        if not toks:
            continue
        if not _ID_RE.match(toks[0]):
            errors.append(f"'$orderby' has an invalid column name {toks[0]!r}")
        elif len(toks) == 1:
            out.append((toks[0], False))
        elif len(toks) == 2 and toks[1].lower() in ("asc", "desc"):
            out.append((toks[0], toks[1].lower() == "desc"))
        else:
            errors.append(f"'$orderby' item {item.strip()!r} is malformed "
                          "(expected '<column> [asc|desc]')")
    if errors:
        raise ConfigError(errors)
    return out


# ---------------------------------------------------------------------------
# $filter compiler: OData v2 comparison grammar -> pyarrow expression
# ---------------------------------------------------------------------------

_FILTER_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<lparen>\()"
    r"|(?P<rparen>\))"
    r"|(?P<comma>,)"
    r"|(?P<datetime>datetime'(?:[^']|'')*')"
    r"|(?P<string>'(?:[^']|'')*')"
    r"|(?P<number>-?\d+(?:\.\d+)?)"
    r"|(?P<word>[A-Za-z_][A-Za-z0-9_.]*)"
    r")"
)

_CMP_OPS = ("eq", "ne", "gt", "ge", "lt", "le")
# field-on-the-right comparisons flip the operator: 5 lt x == x gt 5
_CMP_FLIP = {"eq": "eq", "ne": "ne", "gt": "lt", "ge": "le", "lt": "gt", "le": "ge"}
_KEYWORDS = set(_CMP_OPS) | {"and", "or", "not", "null", "true", "false"}

# OData v2 canonical functions (the reference's client passes the raw
# query through to the service, docs/SapOData-batchsource.md — these are
# the string/date functions of the v2 URI grammar), compiled to pyarrow
# kernels. Boolean-valued ones may stand alone as a predicate
# (`substringof('a', Name)`) or compare against true/false.
_BOOL_FUNCS = {"substringof", "startswith", "endswith"}
_FILTER_FUNCS = _BOOL_FUNCS | {
    "tolower", "toupper", "trim", "length",
    "year", "month", "day", "hour", "minute", "second",
    "round", "floor", "ceiling",
    "concat", "indexof", "substring", "replace",
}

# OData v2 arithmetic: mul/div/mod bind tighter than add/sub, both bind
# tighter than comparisons. `div`/`mod` on integers are truncated (C
# semantics — pyarrow's integer `divide` kernel and DuckDB's `%` agree);
# `mod` compiles to a - (a div b)*b, so it carries integer semantics
# (float operands would see true division and a ~0 remainder — OData v2
# defines mod on integral types).
_ARITH_ADD = ("add", "sub")
_ARITH_MUL = ("mul", "div", "mod")


def _trunc_div_int(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _fold_arith(op: str, a, b):
    """Constant-fold arithmetic between two literals (OData null
    arithmetic yields null)."""
    if a is None or b is None:
        return None
    ok = all(
        isinstance(v, (int, float)) and not isinstance(v, bool)
        for v in (a, b)
    )
    if not ok:
        raise ConfigError([
            f"'$filter' arithmetic '{op}' needs numeric operands"
        ])
    both_int = isinstance(a, int) and isinstance(b, int)
    if op in ("div", "mod") and b == 0:
        raise ConfigError([f"'$filter' has a division by zero ('{op}')"])
    if op == "add":
        return a + b
    if op == "sub":
        return a - b
    if op == "mul":
        return a * b
    if op == "div":
        return _trunc_div_int(a, b) if both_int else a / b
    if both_int:
        return a - _trunc_div_int(a, b) * b
    import math

    return math.fmod(a, b)


def _tokenize_filter(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    n = len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        m = _FILTER_TOKEN_RE.match(text, i)
        if m is None:
            raise ConfigError([
                f"'$filter' has an unexpected character at ...{text[i:i+20]!r}"
            ])
        out.append((m.lastgroup, m.group(m.lastgroup)))
        i = m.end()
    return out


class _FilterParser:
    """Recursive-descent compiler for the reference's ``$filter`` grammar
    (the ``BuyerName eq 'TECUM'`` shape of ``reference
    SapODataConfigTest.java:59``; full OData v2 comparison subset:
    ``eq ne gt ge lt le``, ``and/or/not``, parentheses, arithmetic
    ``add sub mul div mod`` with OData precedence, single-quoted
    strings with ``''`` escapes, integer/decimal literals,
    ``datetime'...'``, ``null``/``true``/``false``) into a
    ``pyarrow.compute`` expression that pushes into a Parquet read
    (``ops.read_projected(filter_expr=...)`` -> row-group pruning).
    SQL three-valued logic comes for free: a NULL comparison is NULL and
    the scan drops it, matching the DuckDB oracle's WHERE."""

    def __init__(self, text: str):
        self.toks = _tokenize_filter(text)
        self.i = 0

    def _peek(self) -> tuple[str | None, str | None]:
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _peek_word(self) -> str | None:
        kind, val = self._peek()
        return val.lower() if kind == "word" else None

    def _next(self) -> tuple[str | None, str | None]:
        t = self._peek()
        self.i += 1
        return t

    def parse(self):
        expr = self._or_expr()
        if self.i != len(self.toks):
            raise ConfigError([
                f"'$filter' has trailing tokens starting at "
                f"{self.toks[self.i][1]!r}"
            ])
        return expr

    def _or_expr(self):
        expr = self._and_expr()
        while self._peek_word() == "or":
            self._next()
            expr = expr | self._and_expr()
        return expr

    def _and_expr(self):
        expr = self._unary()
        while self._peek_word() == "and":
            self._next()
            expr = expr & self._unary()
        return expr

    def _unary(self):
        if self._peek_word() == "not":
            self._next()
            return ~self._unary()
        if self._peek()[0] == "lparen":
            self._next()
            expr = self._or_expr()
            if self._next()[0] != "rparen":
                raise ConfigError(["'$filter' has an unclosed '('"])
            return expr
        return self._comparison()

    def _comparison(self):
        l_kind, l_val = self._additive()
        kind, opname = self._peek()
        if kind != "word" or (opname or "").lower() not in _CMP_OPS:
            # a boolean function may stand alone as a whole predicate
            if l_kind == "bexpr":
                return l_val
            raise ConfigError([
                f"'$filter' expected a comparison operator "
                f"({'/'.join(_CMP_OPS)}), got {opname!r}"
            ])
        self._next()
        op = opname.lower()
        r_kind, r_val = self._additive()
        if l_kind == "lit" and r_kind == "lit":
            raise ConfigError([
                "'$filter' comparison needs a field on at least one side"
            ])
        if l_kind == "lit":  # literal-on-the-left: flip
            l_kind, l_val, r_kind, r_val = r_kind, r_val, l_kind, l_val
            op = _CMP_FLIP[op]
        left = l_val  # an expression (field or compiled function)
        # `field eq null` is SQL `IS NULL` (OData semantics), not the
        # always-NULL `= NULL`
        if r_kind == "lit" and r_val is None:
            if op == "eq":
                return left.is_null()
            if op == "ne":
                return ~left.is_null()
            # ordering against null: SQL/DuckDB `x > NULL` is NULL for
            # EVERY row — compile to the constant null boolean, which
            # Kleene-propagates through not/and/or exactly like the
            # oracle's WHERE (a ConfigError here would reject queries
            # the oracle accepts — review finding)
            import pyarrow as _pa
            import pyarrow.compute as _pc

            return _pc.scalar(None).cast(_pa.bool_())
        import operator as _op

        return {
            "eq": _op.eq, "ne": _op.ne, "gt": _op.gt,
            "ge": _op.ge, "lt": _op.lt, "le": _op.le,
        }[op](left, r_val)

    def _additive(self):
        """``addExpr := mulExpr (('add'|'sub') mulExpr)*`` — literal
        pairs constant-fold (so flip / IS-NULL handling downstream still
        sees a plain literal), anything else compiles to a pyarrow
        arithmetic expression."""
        k, v = self._multiplicative()
        while self._peek_word() in _ARITH_ADD:
            op = self._next()[1].lower()
            rk, rv = self._multiplicative()
            k, v = self._arith(op, k, v, rk, rv)
        return k, v

    def _multiplicative(self):
        k, v = self._operand()
        while self._peek_word() in _ARITH_MUL:
            op = self._next()[1].lower()
            rk, rv = self._operand()
            k, v = self._arith(op, k, v, rk, rv)
        return k, v

    def _arith(self, op: str, lk, lv, rk, rv):
        import pyarrow.compute as pc

        if lk == "bexpr" or rk == "bexpr":
            raise ConfigError([
                f"'$filter' arithmetic '{op}' needs numeric operands, "
                "got a boolean expression"
            ])
        if lk == "lit" and rk == "lit":
            return "lit", _fold_arith(op, lv, rv)
        for k, v in ((lk, lv), (rk, rv)):
            if k == "lit" and not (
                v is None
                or (isinstance(v, (int, float)) and not isinstance(v, bool))
            ):
                raise ConfigError([
                    f"'$filter' arithmetic '{op}' needs numeric operands"
                ])
        if op in ("div", "mod") and rk == "lit" and rv == 0:
            raise ConfigError([
                f"'$filter' has a division by zero ('{op}')"
            ])
        left = pc.scalar(lv) if lk == "lit" else lv
        right = pc.scalar(rv) if rk == "lit" else rv
        if op in ("div", "mod") and rk != "lit":
            # SQL x/0 is NULL; Arrow raises on integer /0 and yields
            # +-inf on float /0. Null out zero slots BEFORE dividing
            # (if_else evaluates both branches, so masking the result
            # would still trip the integer kernel).
            right = pc.if_else(
                pc.not_equal(right, pc.scalar(0)), right, pc.scalar(None)
            )
        if op == "mod":
            # a - trunc(a/b)*b: on integers pc.divide already truncates
            # (trunc is the identity) -> C remainder, the same
            # sign-of-dividend semantics as DuckDB's %; on floats the
            # trunc turns true division into fmod (matches _fold_arith)
            quot = pc.trunc(pc.divide(left, right))
            return "expr", pc.subtract(left, pc.multiply(quot, right))
        kernel = {
            "add": pc.add, "sub": pc.subtract,
            "mul": pc.multiply, "div": pc.divide,
        }[op]
        return "expr", kernel(left, right)

    def _function(self, fname: str):
        """Compile ``fname(arg, ...)`` (lparen already peeked) into a
        pyarrow expression; -> ("bexpr"|"expr", expression)."""
        import pyarrow.compute as pc

        self._next()  # consume '('
        args: list[tuple[str, object]] = []
        if self._peek()[0] != "rparen":
            args.append(self._additive())
            while self._peek()[0] == "comma":
                self._next()
                args.append(self._additive())
        if self._next()[0] != "rparen":
            raise ConfigError([
                f"'$filter' function {fname!r} is missing a closing ')'"
            ])

        if any(k == "lit" and v is None for k, v in args):
            # null propagation: every canonical function of a NULL
            # argument is NULL (SQL lower(NULL)=NULL etc.) — fold at
            # compile time, because the string/date kernels have no
            # null-typed-scalar variant and would crash the SCAN with
            # ArrowNotImplementedError after validate() accepted the
            # config (review finding). Boolean functions fold to the
            # constant null predicate (Kleene through not/and/or,
            # never-matching standalone), value functions to the null
            # literal (comparisons/arithmetic then propagate it).
            if fname in _BOOL_FUNCS:
                import pyarrow as _pa

                return "bexpr", pc.scalar(None).cast(_pa.bool_())
            return "lit", None

        def arity(n: int) -> None:
            if len(args) != n:
                raise ConfigError([
                    f"'$filter' function {fname!r} takes {n} argument(s), "
                    f"got {len(args)}"
                ])

        def expr(i: int):
            k, v = args[i]
            return pa_scalar_expr(v) if k == "lit" else v

        def lit_str(i: int) -> str:
            k, v = args[i]
            if k != "lit" or not isinstance(v, str):
                raise ConfigError([
                    f"'$filter' function {fname!r} argument {i + 1} must "
                    "be a string literal"
                ])
            return v

        def pa_scalar_expr(v):
            import pyarrow as _pa

            return pc.scalar(v) if v is not None else pc.scalar(_pa.NA)

        def lit_int(i: int, minimum: int = 0) -> int:
            k, v = args[i]
            if k != "lit" or not isinstance(v, int) or isinstance(v, bool) \
                    or v < minimum:
                raise ConfigError([
                    f"'$filter' function {fname!r} argument {i + 1} must "
                    f"be an integer literal >= {minimum}"
                ])
            return v

        if fname == "substringof":  # substringof(needle, haystack)
            arity(2)
            return "bexpr", pc.match_substring(expr(1), pattern=lit_str(0))
        if fname in ("startswith", "endswith"):
            arity(2)
            kernel = pc.starts_with if fname == "startswith" else pc.ends_with
            return "bexpr", kernel(expr(0), pattern=lit_str(1))
        if fname == "concat":
            arity(2)
            # element-wise concat with empty separator; any-null -> null
            # (matches SQL ||)
            return "expr", pc.binary_join_element_wise(expr(0), expr(1), "")
        if fname == "indexof":  # indexof(haystack, needle): 0-based, -1
            arity(2)
            return "expr", pc.find_substring(expr(0), pattern=lit_str(1))
        if fname == "replace":
            arity(3)
            return "expr", pc.replace_substring(
                expr(0), pattern=lit_str(1), replacement=lit_str(2)
            )
        if fname == "substring":  # substring(s, start[, length]), 0-based
            if len(args) not in (2, 3):
                raise ConfigError([
                    f"'$filter' function 'substring' takes 2 or 3 "
                    f"arguments, got {len(args)}"
                ])
            start = lit_int(1)
            if len(args) == 3:
                return "expr", pc.utf8_slice_codeunits(
                    expr(0), start=start, stop=start + lit_int(2)
                )
            return "expr", pc.utf8_slice_codeunits(expr(0), start=start)
        if fname == "round":
            arity(1)
            # OData/SQL round: halves away from zero (pyarrow's default
            # is half_to_even — must be explicit)
            return "expr", pc.round(
                expr(0), ndigits=0, round_mode="half_towards_infinity"
            )
        arity(1)
        kernel = {
            "tolower": pc.utf8_lower, "toupper": pc.utf8_upper,
            "trim": pc.utf8_trim_whitespace, "length": pc.utf8_length,
            "year": pc.year, "month": pc.month, "day": pc.day,
            "hour": pc.hour, "minute": pc.minute, "second": pc.second,
            "floor": pc.floor, "ceiling": pc.ceil,
        }[fname]
        return "expr", kernel(expr(0))

    def _operand(self) -> tuple[str, object]:
        """-> (kind, value): ("lit", python value) for literals, or
        ("expr"/"bexpr", pyarrow expression) for fields and compiled
        function calls (bexpr = boolean-valued, usable as a bare
        predicate)."""
        import pyarrow.compute as pc

        kind, val = self._next()
        if kind == "string":
            return "lit", val[1:-1].replace("''", "'")
        if kind == "datetime":
            from datetime import datetime

            raw = val[len("datetime'") : -1].replace("''", "'")
            try:
                return "lit", datetime.fromisoformat(raw)
            except ValueError as e:
                # keep malformed literals inside the accumulated
                # ConfigError surface (validate() catches ConfigError
                # only; a bare stdlib ValueError would abort validation
                # context-free and drop the other options' errors)
                raise ConfigError([
                    f"'$filter' has a malformed datetime literal {raw!r}: {e}"
                ]) from e
        if kind == "number":
            return "lit", float(val) if "." in val else int(val)
        if kind == "word":
            w = val.lower()
            if w == "null":
                return "lit", None
            if w == "true":
                return "lit", True
            if w == "false":
                return "lit", False
            if w in _KEYWORDS:
                raise ConfigError([
                    f"'$filter' has a misplaced keyword {val!r}"
                ])
            if self._peek()[0] == "lparen":
                if w not in _FILTER_FUNCS:
                    raise ConfigError([
                        f"'$filter' has an unsupported function {val!r} "
                        f"(supported: {'/'.join(sorted(_FILTER_FUNCS))})"
                    ])
                return self._function(w)
            return "expr", pc.field(val)
        raise ConfigError([
            f"'$filter' expected a field or literal, got {val!r}"
        ])


def filter_to_expression(text: str):
    """Compile a ``$filter`` expression string into a pyarrow compute
    expression suitable for Parquet read pushdown."""
    if not text.strip():
        return None
    return _FilterParser(text).parse()


def parse_filter(query: str):
    """Extract and compile the ``$filter`` option of a query string
    (None when absent)."""
    body = _query_option(query, "$filter")
    return None if body is None else filter_to_expression(body)


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
        # a malformed query string fails config validation (the
        # reference validates the query inside SapODataConfig.validate)
        for parser in (parse_filter, parse_orderby, parse_top_skip):
            try:
                parser(self.query)
            except ConfigError as e:
                errors.extend(e.errors)
        if errors:
            raise ConfigError(errors)

    @property
    def select_columns(self) -> list[str]:
        return parse_select(self.query)

    @property
    def filter_expression(self):
        """Compiled ``$filter`` pyarrow expression (None when absent)."""
        return parse_filter(self.query)

    @property
    def orderby(self) -> list[tuple[str, bool]]:
        """Compiled ``$orderby`` as [(column, descending)]."""
        return parse_orderby(self.query)

    @property
    def top_skip(self) -> tuple[int | None, int | None]:
        return parse_top_skip(self.query)
