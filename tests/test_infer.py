"""Manifest inference: the draft must (a) encode the strictest constraints
the profiled data satisfies — so the SAME data validates clean against it
(round trip) — (b) catch injected corruption, (c) never collect a
high-cardinality column into an enum, and (d) survive the YAML round trip
through the same meta-validation as a hand-written manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.infer import infer_manifest, profile_for_inference, write_inferred_manifest
from schema_enforcer_spark.manifest import load_manifest, manifest_from_dict


@pytest.fixture()
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _kinds(draft, column=None):
    return {
        r["kind"]
        for r in draft["rules"]
        if column is None or r.get("column") == column or r.get("columns") == [column]
    }


def test_round_trip_clean(spark, events):
    draft = infer_manifest(events, "schemas/ev_inferred", table="events")
    m = manifest_from_dict(draft)  # meta-validation must accept the draft
    report = ValidationEngine(m, key_columns=["event_id"]).validate(events)
    assert report.passes(), "inferred draft must hold on the data it was inferred from"
    assert report.violations.count() == 0


def test_inferred_rule_shapes(spark, events):
    draft = infer_manifest(events, "schemas/ev_inferred")
    assert _kinds(draft, "event_type") == {"type", "required", "enum"}
    enum = next(r for r in draft["rules"] if r["kind"] == "enum" and r["column"] == "event_type")
    assert enum["values"] == ["click", "error", "purchase", "signup", "view"]  # sorted
    # unique key candidate: null-free, distinct == rows
    assert _kinds(draft, "event_id") == {"type", "required", "range", "unique"}
    # numeric without enum -> range; string without enum -> length
    assert "range" in _kinds(draft, "value") and "enum" not in _kinds(draft, "value")
    assert "length" in _kinds(draft, "props")
    # timestamps: type + required only (no range pinning time bounds)
    assert _kinds(draft, "ts") == {"type", "required"}
    ts_type = next(r for r in draft["rules"] if r["kind"] == "type" and r["column"] == "ts")
    assert ts_type["type"] == "timestamp"


def test_corruption_caught(spark, events):
    m = manifest_from_dict(infer_manifest(events, "schemas/ev_inferred"))
    bad = events.withColumn(
        "event_type",
        F.when(F.col("event_id") == 5, F.lit("hack")).otherwise(F.col("event_type")),
    ).withColumn(
        "value", F.when(F.col("event_id") == 7, F.lit(1e9)).otherwise(F.col("value"))
    )
    viols = ValidationEngine(m, key_columns=["event_id"]).violations(bad).collect()
    msgs = sorted(v["message"] for v in viols)
    assert len(msgs) == 2
    assert "'hack' is not one of" in msgs[0]
    assert "greater than the maximum" in msgs[1]


def test_nulls_and_cardinality_gates(spark):
    rows = [(i, None if i % 3 == 0 else f"v{i}", i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, s string, b int")
    prof = profile_for_inference(df, enum_max=16)
    # s: has nulls -> no required; 133 distinct >> prefilter -> never collected
    assert prof["s"]["n_nulls"] > 0 and prof["s"]["enum_values"] is None
    draft = infer_manifest(df, "schemas/t")
    assert "required" not in _kinds(draft, "s")
    assert "enum" not in _kinds(draft, "s")
    assert "length" in _kinds(draft, "s")  # nullable still gets bounds
    # b: 2 distinct -> enum, no range
    assert "enum" in _kinds(draft, "b") and "range" not in _kinds(draft, "b")
    # k: unique key
    assert "unique" in _kinds(draft, "k")


def test_format_inference(spark):
    rows = [
        (i, f"2024-03-{(i % 28) + 1:02d}", f"10.0.{i % 40}.{i % 25}", f"word{i}")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k int, day string, addr string, w string")
    draft = infer_manifest(df, "schemas/fmt", enum_max=16)
    # all-match shape columns past enum reach pin a format rule, not length
    day = _kinds(draft, "day")
    assert "format" in day and "length" not in day and "enum" not in day
    assert next(
        r for r in draft["rules"] if r["kind"] == "format" and r["column"] == "day"
    )["format"] == "date"
    assert next(
        r for r in draft["rules"] if r["kind"] == "format" and r["column"] == "addr"
    )["format"] == "ipv4"
    # a plain word column matches no distinctive format -> length fallback
    assert "format" not in _kinds(draft, "w") and "length" in _kinds(draft, "w")
    # enum still wins over format when cardinality allows it: 10 distinct
    # full dates all match `date`, but the enum is the stricter constraint
    small = df.withColumn(
        "day", F.concat(F.lit("2024-03-0"), (F.col("k") % 9 + 1).cast("string"))
    )
    draft2 = infer_manifest(small, "schemas/fmt2", enum_max=16)
    dk = _kinds(draft2, "day")
    assert "enum" in dk and "format" not in dk
    # formats=False skips the probe entirely
    draft3 = infer_manifest(df, "schemas/fmt3", formats=False)
    assert "format" not in _kinds(draft3, "day")
    assert "length" in _kinds(draft3, "day")
    # the drafted format rule round-trips meta-validation and holds
    m = manifest_from_dict(draft)
    report = ValidationEngine(m, key_columns=["k"]).validate(df)
    assert report.passes()
    # calendar-awareness: an invalid day-in-month fails the drafted rule
    bad = df.withColumn(
        "day", F.when(F.col("k") == 3, F.lit("2024-02-30")).otherwise(F.col("day"))
    )
    assert not ValidationEngine(m, key_columns=["k"]).validate(bad).passes()


def test_unsupported_types_profile_nulls_only(spark):
    df = spark.createDataFrame(
        [(1, [1, 2], {"a": 1})], "k int, arr array<int>, m map<string,int>"
    )
    draft = infer_manifest(df, "schemas/t")
    assert _kinds(draft, "arr") == {"required"}
    assert _kinds(draft, "m") == {"required"}


def test_yaml_round_trip(spark, events, tmp_path):
    out = str(tmp_path / "draft.yml")
    draft = write_inferred_manifest(events, "schemas/ev_inferred", out, table="events")
    m = load_manifest(out)
    assert m.id == "schemas/ev_inferred"
    assert len(m.rules) == len(draft["rules"])
    report = ValidationEngine(m, key_columns=["event_id"]).validate(events)
    assert report.passes()


def test_cli_infer_flag(spark, events, tmp_path):
    from schema_enforcer_spark.cli import main as cli_main

    out = str(tmp_path / "cli_draft.yml")
    rc = cli_main(
        [
            "--infer-manifest", out,
            "--input", "/root/testdata/sf0.001/events.parquet",
            "--infer-id", "schemas/cli_inferred",
        ]
    )
    assert rc == 0
    m = load_manifest(out)
    assert m.id == "schemas/cli_inferred"
    # and the draft immediately validates its own source table clean
    rc2 = cli_main(
        [
            "--manifest", out,
            "--input", "/root/testdata/sf0.001/events.parquet",
            "--key-columns", "event_id",
        ]
    )
    assert rc2 == 0
    # no manifest and no infer mode is a usage error
    assert cli_main(["--input", "/x"]) == 2


def test_fd_inference(spark):
    from schema_enforcer_spark.infer import infer_fds

    df = (
        spark.range(200)
        .select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") % 20).cast("long").alias("a"),
            # b is derived from a -> FD a->b holds (and b->a does NOT:
            # two a values share each b)
            (F.col("id") % 20 % 10).cast("long").alias("b"),
            # c breaks every dependency with a ~coprime cycle
            (F.col("id") % 7).cast("long").alias("c"),
        )
    )
    fds = infer_fds(df)
    assert (("a",), "b") in fds
    assert (("b",), "a") not in fds
    assert not any(det == ("k",) for det, _ in fds)  # unique determinant pruned
    assert (("a",), "c") not in fds and (("c",), "b") not in fds

    # a single exception row must kill the FD (exact pass, not the HLL)
    broken = df.withColumn(
        "b", F.when(F.col("k") == 199, F.lit(999)).otherwise(F.col("b"))
    )
    assert (("a",), "b") not in infer_fds(broken)

    # NULL-as-value semantics: a=1 maps to {NULL, 1} -> not an FD
    nulled = df.withColumn(
        "b", F.when((F.col("a") == 1) & (F.col("k") < 100), F.lit(None)).otherwise(F.col("b"))
    )
    assert (("a",), "b") not in infer_fds(nulled)

    # draft integration: opt-in flag, rule round-trips meta-validation,
    # and the drafted manifest passes on its own source data
    draft = infer_manifest(df, "schemas/fd_draft", fds=True)
    fd_rules = [r for r in draft["rules"] if r["kind"] == "functional_dependency"]
    assert {"columns": ["a"], "dependent": "b", "kind": "functional_dependency"} in [
        {**r} for r in fd_rules
    ]
    m = manifest_from_dict(draft)
    assert ValidationEngine(m, key_columns=["k"]).validate(df).passes()
    # the drafted FD catches later corruption
    assert not ValidationEngine(m, key_columns=["k"]).validate(broken).passes()
    # default stays off
    draft2 = infer_manifest(df, "schemas/fd_off")
    assert not any(r["kind"] == "functional_dependency" for r in draft2["rules"])


# --- property: the inference round-trip contract — a drafted manifest
# (formats + FDs on) always validates CLEAN on the data it was drafted
# from, because every emitted rule is the strictest constraint the data
# already satisfies ---

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    _rows = st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-50, 50)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", "2024-01-02", ""])),
            st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        ),
        min_size=1,
        max_size=40,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    @given(rows=_rows, enum_max=st.sampled_from([2, 16]))
    def test_infer_roundtrip_property(spark, rows, enum_max):
        from schema_enforcer_spark.manifest import manifest_from_dict

        df = spark.createDataFrame(
            [(i, *r) for i, r in enumerate(rows)],
            "k long, i long, s string, f double",
        )
        draft = infer_manifest(df, "schemas/prop", enum_max=enum_max, fds=True)
        m = manifest_from_dict(draft)  # meta-validation must accept it
        report = ValidationEngine(m, key_columns=["k"]).validate(df)
        assert report.passes(), [
            r["message"] for r in report.violations.collect()[:5]
        ]
        report.unpersist()


def test_fd_inference_composite(spark):
    """max_determinant=2: (a, b) -> c discovered only when MINIMAL —
    targets a single member already determines are pruned, ~unique pair
    determinants are pruned."""
    from schema_enforcer_spark.infer import infer_fds

    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 6).alias("a"),
        (F.col("id") % 10).alias("b"),
        # c = f(a, b) genuinely needs BOTH (lcm(6,10)=30 states), and
        # neither a->c nor b->c holds
        ((F.col("id") % 6) * 10 + (F.col("id") % 10)).alias("c"),
        # d = f(a) alone -> (a, b) -> d must be pruned as non-minimal
        (F.col("id") % 6 % 3).alias("d"),
    )
    fds = infer_fds(df, max_determinant=2)
    assert (("a", "b"), "c") in fds
    assert (("a",), "d") in fds
    assert not any(det == ("a", "b") and dep == "d" for det, dep in fds)
    # level-1-only call never returns composites
    assert all(len(det) == 1 for det, _ in infer_fds(df))
    # the composite FD survives manifest round-trip + validates clean
    draft = {
        "id": "schemas/cfd",
        "rules": [{"kind": "functional_dependency", "columns": ["a", "b"], "dependent": "c"}],
    }
    m = manifest_from_dict(draft)
    assert ValidationEngine(m, key_columns=["k"]).validate(df).passes()
    # one exception row breaks it through the same evaluator
    broken = df.withColumn(
        "c", F.when(F.col("k") == 399, F.lit(-1)).otherwise(F.col("c"))
    )
    assert not ValidationEngine(m, key_columns=["k"]).validate(broken).passes()
    assert (("a", "b"), "c") not in infer_fds(broken, max_determinant=2)
