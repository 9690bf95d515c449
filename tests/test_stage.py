"""User-extension Stage protocol (SURVEY §2.6).

Mirrors the reference's plugin-config validation tests
(``reference src/test/java/io/cdap/plugin/sap/SapODataConfigTest.java:81-114``:
invalid config -> configurePipeline fails with ACCUMULATED causes) plus
the @Macro late-binding and schema-evolution guards.
"""

import pyarrow as pa
import pytest

from sapray.stage import (
    REGISTRY,
    Macro,
    Stage,
    StageError,
    StageRegistry,
    build_pipeline,
    is_stringy,
    register_stage,
    resolve_macros,
)

DOCS = pa.table({
    "doc_id": pa.array([1, 2, 3], pa.int64()),
    "text": pa.array(["the cat", "le chat", "der hund"], pa.large_string()),
})


def test_text_family_registered():
    for name in ("token_count", "quality_score", "langid", "fingerprint",
                 "pii_redact", "repetition_stats", "chunk_docs",
                 "decontaminate"):
        assert name in REGISTRY.names()


def test_stateful_families_registered():
    """The dedup/similarity signature stages and media transforms are
    Stage-registered too (VERDICT r4 stretch #9) — the extension surface
    covers stateful actor-pool families, not just the text stages."""
    import sapray.dedup  # noqa: F401 — registration on import
    import sapray.multimodal  # noqa: F401

    for name in ("minhash_signature", "simhash_signature",
                 "media_features", "media_transform"):
        assert name in REGISTRY.names()


def test_minhash_stage_in_pipeline(ray_session):
    """MinHash + SimHash compose in a build_pipeline chain with plan-time
    schema threading, and the executed output matches the plan."""
    import ray.data

    import sapray.dedup  # noqa: F401

    ds = ray.data.from_arrow(DOCS)
    out, schema = build_pipeline(
        ds,
        [("minhash_signature", {"num_perm": 8, "text_column": "text"}),
         ("simhash_signature", {"text_column": "text"})],
    )
    assert schema.names == ["doc_id", "text", "minhash", "simhash"]
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    assert len(rows[0]["minhash"]) == 8
    assert set(rows[0]) == set(schema.names)
    # plan-time failure on a bad input schema, before any task runs
    bad = ray.data.from_arrow(pa.table({"doc_id": pa.array([1])}))
    with pytest.raises(StageError, match="required input column 'text'"):
        build_pipeline(bad, ["minhash_signature"])


def test_media_stage_plan():
    import sapray.multimodal as mm

    out = REGISTRY.get("media_features")().plan(mm.MEDIA_SCHEMA)
    assert out.names[-1] == "feature"
    with pytest.raises(StageError, match="payload"):
        REGISTRY.get("media_transform")().plan(
            pa.schema([("media_id", pa.int64()), ("content_type", pa.string()),
                       ("payload", pa.string())])
        )


def test_plan_threads_schemas():
    tc = REGISTRY.get("token_count")()
    out = tc.plan(DOCS.schema)
    assert out.names == ["doc_id", "text", "n_ws_tokens", "n_bpe_tokens"]
    # chain: quality over token_count's output
    out2 = REGISTRY.get("quality_score")().plan(out)
    assert out2.names[-3:] == ["n_chars_calc", "n_spaces", "stop_hits"]


def test_invalid_config_accumulates_errors():
    """SapODataConfigTest.java:81-114 analogue: ALL failures surface in
    one plan-time error, not fail-fast one at a time."""
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.int64())])

    class TwoBad(Stage):
        name = "two_bad"

        def required_input(self):
            return {"text": is_stringy, "missing_col": is_stringy}

    with pytest.raises(StageError) as e:
        TwoBad().plan(schema)
    assert len(e.value.errors) == 2
    msgs = "\n".join(e.value.errors)
    assert "missing_col" in msgs and "unsupported type" in msgs


def test_added_column_collision_rejected():
    tc = REGISTRY.get("token_count")()
    schema = DOCS.schema.append(pa.field("n_ws_tokens", pa.int64()))
    with pytest.raises(StageError, match="already exists"):
        tc.plan(schema)


def test_evolution_guard_rejects_dropping_stage():
    """A buggy appending stage whose declared output drops an input
    column fails plan() via schema.validate_evolution."""

    class Dropper(Stage):
        name = "dropper"

        def output_schema(self, schema_in):
            return pa.schema([f for f in schema_in if f.name != "doc_id"])

    with pytest.raises(StageError, match="legal evolution"):
        Dropper().plan(DOCS.schema)


def test_schema_replacing_stage_opts_out():
    cd = REGISTRY.get("chunk_docs")(size=4, overlap=1)
    out = cd.plan(DOCS.schema)
    assert out.names == ["doc_id", "chunk_idx", "chunk_text"]


def test_macro_resolution():
    assert resolve_macros(
        {"a": Macro("k"), "b": 1}, {"k": "v"}
    ) == {"a": "v", "b": 1}
    assert resolve_macros({"a": Macro("k", default="d")}, None) == {"a": "d"}
    with pytest.raises(StageError, match=r"\$\{k\}"):
        resolve_macros({"a": Macro("k"), "c": Macro("k2")}, None)


def test_unknown_stage_name():
    with pytest.raises(KeyError, match="unknown stage"):
        REGISTRY.get("no_such_stage")


def test_registry_rejects_nameless_and_duplicates():
    r = StageRegistry()

    class NoName(Stage):
        pass

    with pytest.raises(ValueError, match="must set a name"):
        r.register(NoName)

    class A(Stage):
        name = "dup"

    class B(Stage):
        name = "dup"

    r.register(A)
    r.register(A)  # same class re-registration is idempotent
    with pytest.raises(ValueError, match="already registered"):
        r.register(B)


def test_build_pipeline_end_to_end(ray_session):
    """A brand-new user stage registered into a private registry runs
    through build_pipeline with plan-time validation and macro config."""
    import ray.data

    reg = StageRegistry()
    for n in ("token_count", "quality_score"):
        reg.register(REGISTRY.get(n))

    @reg.register
    class Shout(Stage):
        name = "shout"
        description = "uppercases the text column"

        def __init__(self, text_column: str = "text", out_column: str = "loud"):
            self.text_column = text_column
            self.out_column = out_column

        def required_input(self):
            return {self.text_column: is_stringy}

        def added_columns(self, schema_in):
            return {self.out_column: schema_in.field(self.text_column).type}

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.append_column(
                self.out_column, pc.utf8_upper(batch.column(self.text_column))
            )

    ds = ray.data.from_arrow(DOCS)
    out, schema = build_pipeline(
        ds,
        ["token_count", ("shout", {"out_column": Macro("loud_name", default="loud")})],
        registry=reg,
    )
    assert schema.names == ["doc_id", "text", "n_ws_tokens", "n_bpe_tokens", "loud"]
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    assert rows[0]["loud"] == "THE CAT"
    assert rows[0]["n_ws_tokens"] == 2
    # schema promised by plan() matches what actually ran
    assert set(rows[0]) == set(schema.names)


def test_build_pipeline_fails_at_plan_time(ray_session):
    """A schema mismatch fails BEFORE execution (configurePipeline
    semantics), not inside a task."""
    import ray.data

    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([1])}))
    with pytest.raises(StageError, match="required input column 'text'"):
        build_pipeline(ds, ["token_count"])
