"""User-extension pipeline-step protocol (SURVEY §2.6).

The reference's whole extension surface is the CDAP plugin API: a plugin
declares itself with ``@Plugin``/``@Name``/``@Description`` annotations
(``reference src/main/java/io/cdap/plugin/sap/SapODataSource.java:49-51``),
validates its config and DECLARES ITS OUTPUT SCHEMA at plan time in
``configurePipeline`` (``SapODataSource.java:62-85`` — validate first,
then ``stageConfigurer.setOutputSchema``), transforms records at run
time (``transform``, ``:121``), and may mark config fields ``@Macro``
for late binding (``SapODataConfig.java:57-92``): such fields are only
presence-checked at deployment and resolve from runtime arguments.

Ray-Data equivalent:

* a **Stage** is a class with ``name``/``description`` attributes (the
  ``@Name``/``@Description`` analogue), a plan-time
  ``plan(schema_in) -> schema_out`` (the ``configurePipeline``
  analogue: validate inputs with ACCUMULATED errors, then declare the
  output schema), and a batch-callable ``__call__(pa.Table) -> pa.Table``
  runtime executed as a ``map_batches`` actor-pool stage (setup once per
  actor in ``__init__``, work per batch);
* a **StageRegistry** maps names to Stage classes (the plugin registry);
* :func:`build_pipeline` chains registered stages over a Dataset,
  threading each ``plan()`` through the upstream schema BEFORE any task
  launches, so schema errors surface at plan time like a CDAP pipeline
  failing deployment — not minutes into a 100 TB run;
* :class:`Macro` values in a stage's kwargs resolve from
  ``runtime_args`` when the pipeline is built (the ``@Macro``
  late-binding analogue) — unresolved macros without defaults fail the
  plan with an accumulated :class:`StageError`.

Evolution safety: a stage that only APPENDS columns (``evolves = True``,
the default) has its declared output checked against the input schema by
``sapray.schema.validate_evolution`` — no drops, no narrowing, no
nullability relaxation — so a buggy user stage cannot silently corrupt
the downstream schema contract. Schema-REPLACING stages (explode /
chunk) opt out with ``evolves = False`` and take responsibility for
their declared output.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

from sapray.schema import SchemaCompatError, validate_evolution


class StageError(ValueError):
    """Accumulated plan-time stage failures (the CDAP FailureCollector
    analogue, mirroring CDCConfig.validate()'s accumulated errors,
    M19)."""

    def __init__(self, errors: list[str]):
        self.errors = list(errors)
        super().__init__("; ".join(self.errors))


_NO_DEFAULT = object()


class Macro:
    """Late-binding config value (``@Macro``, SapODataConfig.java:57-92).

    ``Macro("key")`` resolves from the ``runtime_args`` passed to
    :func:`build_pipeline`; ``Macro("key", default=...)`` falls back to
    the default when the runtime args don't carry the key. A macro with
    neither fails the plan — named in the accumulated StageError.
    """

    def __init__(self, key: str, default=_NO_DEFAULT):
        self.key = key
        self.default = default

    def resolve(self, runtime_args: dict | None):
        if runtime_args and self.key in runtime_args:
            return runtime_args[self.key]
        if self.default is not _NO_DEFAULT:
            return self.default
        raise KeyError(self.key)

    def __repr__(self) -> str:  # shows up in plan errors
        return f"Macro({self.key!r})"


def resolve_macros(kwargs: dict, runtime_args: dict | None) -> dict:
    """Resolve every :class:`Macro` value in ``kwargs``; unresolved
    macros are accumulated into one StageError (not fail-fast)."""
    out: dict = {}
    missing: list[str] = []
    for k, v in kwargs.items():
        if isinstance(v, Macro):
            try:
                out[k] = v.resolve(runtime_args)
            except KeyError:
                missing.append(
                    f"config field {k!r}: macro ${{{v.key}}} is not in "
                    "runtime_args and has no default"
                )
        else:
            out[k] = v
    if missing:
        raise StageError(missing)
    return out


def is_stringy(t: pa.DataType) -> bool:
    """Either Arrow string width (content is large_string end to end,
    but stages must accept both — CLAUDE.md invariant)."""
    return pa.types.is_string(t) or pa.types.is_large_string(t)


class Stage:
    """Base class for user-extensible pipeline steps.

    Subclasses set ``name``/``description``, implement ``__call__``
    (per-batch Arrow transform), and describe their planning contract
    either declaratively (override :meth:`required_input` /
    :meth:`added_columns`) or wholesale (override :meth:`output_schema`
    with ``evolves = False`` for schema-replacing steps).
    """

    name: str = ""
    description: str = ""
    #: when True, plan() additionally checks the declared output is a
    #: legal evolution of the input (schema.validate_evolution)
    evolves: bool = True

    def required_input(self) -> dict[str, Callable[[pa.DataType], bool]]:
        """column name -> predicate the input column's type must pass."""
        return {}

    def added_columns(self, schema_in: pa.Schema) -> dict[str, pa.DataType]:
        """Columns this stage appends (name -> Arrow type). May depend on
        the input schema (e.g. an output string column inheriting the
        input's string width)."""
        return {}

    def output_schema(self, schema_in: pa.Schema) -> pa.Schema:
        """Declared output schema — default: input + added columns
        (appended nullable, the add-column evolution rule)."""
        out = schema_in
        for n, t in self.added_columns(schema_in).items():
            out = out.append(pa.field(n, t))
        return out

    def plan(self, schema_in: pa.Schema) -> pa.Schema:
        """``configurePipeline``: validate against the upstream schema
        with ACCUMULATED errors, then declare the output schema."""
        errors: list[str] = []
        for col, pred in self.required_input().items():
            if col not in schema_in.names:
                errors.append(
                    f"stage {self.name!r}: required input column {col!r} "
                    f"is missing (input has {schema_in.names})"
                )
            elif not pred(schema_in.field(col).type):
                errors.append(
                    f"stage {self.name!r}: input column {col!r} has "
                    f"unsupported type {schema_in.field(col).type}"
                )
        if errors:
            # input-contract failures accumulate and raise BEFORE
            # added_columns (which may inspect the validated inputs)
            raise StageError(errors)
        errors = [
            f"stage {self.name!r}: output column {n!r} already exists "
            "in the input schema"
            for n in self.added_columns(schema_in)
            if n in schema_in.names
        ]
        if errors:
            raise StageError(errors)
        out = self.output_schema(schema_in)
        if self.evolves:
            try:
                validate_evolution(schema_in, out)
            except SchemaCompatError as e:
                raise StageError(
                    [f"stage {self.name!r}: declared output is not a "
                     f"legal evolution of its input: {e}"]
                ) from e
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError


class StageRegistry:
    """Name -> Stage-class registry (the plugin registry analogue)."""

    def __init__(self):
        self._stages: dict[str, type] = {}

    def register(self, cls: type) -> type:
        name = getattr(cls, "name", "")
        if not name:
            raise ValueError(f"stage class {cls.__name__} must set a name")
        if not callable(cls):
            raise ValueError(f"stage {name!r} is not callable")
        if name in self._stages and self._stages[name] is not cls:
            raise ValueError(f"stage name {name!r} already registered")
        self._stages[name] = cls
        return cls

    def get(self, name: str) -> type:
        if name not in self._stages and self is REGISTRY:
            _ensure_builtin_stages()
        if name not in self._stages:
            raise KeyError(
                f"unknown stage {name!r}; registered: {sorted(self._stages)}"
            )
        return self._stages[name]

    def names(self) -> list[str]:
        if self is REGISTRY:
            _ensure_builtin_stages()
        return sorted(self._stages)


def _ensure_builtin_stages() -> None:
    """Import the engine modules that register built-in stages, so the
    default REGISTRY is self-contained: ``REGISTRY.get("token_count")``
    works without the caller having imported ``sapray.text`` first
    (registration-on-import made lookups import-ORDER-dependent — the
    registry looked empty in any process that touched sapray.stage
    before sapray.queries)."""
    import sapray.dedup  # noqa: F401 — registration on import
    import sapray.multimodal  # noqa: F401
    import sapray.text  # noqa: F401


#: the default registry; ``@register_stage`` adds to it
REGISTRY = StageRegistry()


def register_stage(cls: type) -> type:
    return REGISTRY.register(cls)


def build_pipeline(
    ds,
    steps: list,
    registry: StageRegistry = REGISTRY,
    runtime_args: dict | None = None,
    concurrency=None,
):
    """Chain registered stages over a Dataset with plan-time validation.

    ``steps`` entries are ``name`` or ``(name, kwargs)``; kwargs may
    contain :class:`Macro` values resolved from ``runtime_args``. Each
    stage's ``plan()`` is threaded through the schema BEFORE any task
    launches. Stages run as ``map_batches`` actor pools
    (``concurrency`` defaults to the cluster-scaled ``ops.actor_pool()``)
    so per-actor setup in ``__init__`` happens once per actor, per the
    stateful-stage invariant. Returns ``(dataset, planned_schema)``.
    """
    from sapray import ops

    schema = _dataset_schema(ds)
    out = ds
    if concurrency is None:
        concurrency = ops.actor_pool()
    for step in steps:
        name, kwargs = step if isinstance(step, tuple) else (step, {})
        cls = registry.get(name)
        resolved = resolve_macros(dict(kwargs), runtime_args)
        inst = cls(**resolved)  # plan-time instance: validates config
        schema = inst.plan(schema)
        out = out.map_batches(
            cls,
            fn_constructor_kwargs=resolved,
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return out, schema


def _dataset_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset/Table input."""
    if isinstance(ds, pa.Table):
        return ds.schema
    s = ds.schema()
    if s is None:
        # an all-empty dataset downstream of map_batches loses its
        # schema entirely (empty blocks bypass the UDF) — surface an
        # actionable error instead of AttributeError on None.names
        raise ValueError(
            "dataset has no schema (every block is empty and "
            "schema-less, e.g. a none-matching filter followed by "
            "map_batches); materialize the schema upstream or guard "
            "the empty case before this operator"
        )
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))
