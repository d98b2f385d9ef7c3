"""Binding mechanisms (J1 automap / J2 static map / J5 declared ids) +
row-rule kinds not covered elsewhere (type on string column, unique_items)."""

from __future__ import annotations

import pytest

from schema_enforcer_spark.binding import ManifestNotDefined, ManifestRegistry
from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.manifest import Manifest, Rule


def _m(mid, columns=(), rules=()):
    return Manifest(id=mid, rules=tuple(rules) or (Rule(kind="required", params={"column": columns[0]}),), columns=tuple(columns))


@pytest.fixture()
def registry(base_manifest):
    return ManifestRegistry(
        [
            base_manifest,                      # columns: conv_id..ts
            _m("schemas/events", columns=("event_id", "event_type")),
            _m("schemas/other", columns=("zzz",)),
        ]
    )


def test_automap_on_column_intersection(registry):
    got = [m.id for m in registry.automap(["conv_id", "turn_idx", "role", "text", "tool", "ts"])]
    assert got == ["schemas/transcripts_base"]
    got2 = [m.id for m in registry.automap(["event_id", "value"])]
    assert got2 == ["schemas/events"]


def test_declared_unknown_id_raises(registry):
    with pytest.raises(ManifestNotDefined, match="schemas/nope"):
        registry.bind(["conv_id"], declared=["schemas/nope"])


def test_bind_union_of_mechanisms(registry):
    got = [
        m.id
        for m in registry.bind(
            ["conv_id", "turn_idx"],
            table="transcripts",
            static_map={"transcripts": ["schemas/other"]},
            declared=["schemas/events"],
        )
    ]
    # declared ∪ static ∪ automap, deduped + sorted
    assert got == ["schemas/events", "schemas/other", "schemas/transcripts_base"]


def test_duplicate_manifest_id_rejected(base_manifest):
    reg = ManifestRegistry([base_manifest])
    with pytest.raises(ValueError, match="duplicate manifest id"):
        reg.add(base_manifest)


# -- row-rule kinds without coverage elsewhere -------------------------------


def test_type_rule_on_string_column(spark):
    df = spark.createDataFrame(
        [(1, "12"), (2, "notanint"), (3, None), (4, "-5")], "id long, v string"
    )
    m = Manifest(id="m", rules=(Rule(kind="type", params={"column": "v", "type": "integer"}),))
    viols = ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    assert len(viols) == 1
    assert viols[0]["failing_value"] == "notanint"
    assert viols[0]["message"] == "'notanint' is not of type 'integer'"


def test_type_rule_boolean_and_number(spark):
    df = spark.createDataFrame([(1, "true", "1.5"), (2, "yes", "abc")], "id long, b string, n string")
    m = Manifest(
        id="m",
        rules=(
            Rule(kind="type", params={"column": "b", "type": "boolean"}),
            Rule(kind="type", params={"column": "n", "type": "number"}),
        ),
    )
    msgs = sorted(v["message"] for v in ValidationEngine(m, key_columns=["id"]).violations(df).collect())
    assert msgs == ["'abc' is not of type 'number'", "'yes' is not of type 'boolean'"]


def test_unique_items_rule(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["a", "a"])], "id long, tags array<string>")
    m = Manifest(id="m", rules=(Rule(kind="unique_items", params={"column": "tags"}),))
    viols = ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    assert len(viols) == 1
    assert viols[0]["absolute_path"] == ["2", "tags"]
    assert viols[0]["message"] == '["a","a"] has non-unique elements'


def test_merge_defaults(spark):
    from schema_enforcer_spark.sources.defaults import merge_defaults

    rows = spark.createDataFrame(
        [("c1", 0, None, "hello"), ("c1", 1, "web", None), ("c2", 0, None, None)],
        "conv_id string, turn_idx int, channel string, text string",
    )
    defaults = spark.createDataFrame(
        [("c1", "api", "en"), ("c2", "batch", "de")],
        "conv_id string, channel string, lang string",
    )
    out = {(r["conv_id"], r["turn_idx"]): r for r in merge_defaults(rows, defaults, ["conv_id"]).collect()}
    assert out[("c1", 0)]["channel"] == "api"      # default fills NULL
    assert out[("c1", 1)]["channel"] == "web"      # row value wins
    assert out[("c2", 0)]["channel"] == "batch"
    assert out[("c1", 0)]["lang"] == "en"          # new column appended
    assert out[("c1", 1)]["text"] is None          # untouched columns stay


def test_validate_all_union(spark, transcripts, conversations, base_manifest):
    from schema_enforcer_spark.manifest import load_manifest
    import os

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reg = ManifestRegistry(
        [base_manifest, load_manifest(os.path.join(REPO, "manifests", "transcripts_agg.yml"))]
    )
    from schema_enforcer_spark.synth import inject

    df = inject(transcripts, "invalid_enum")
    report = reg.validate_all(df, ref_tables={"conversations": conversations})
    viols = report.violations.collect()
    ids = {v["schema_id"].split("/")[1] for v in viols}
    assert "transcripts_base" in ids  # enum violation from the base manifest
    verdicts = report.verdicts.collect()
    schemas = {v["schema_id"] for v in verdicts}
    assert schemas == {"schemas/transcripts_base", "schemas/transcripts_agg"}
    # per (manifest x partition) verdicts: FAIL only where the enum defect sits
    base_fails = [v for v in verdicts if v["schema_id"] == "schemas/transcripts_base" and v["result"] == "FAIL"]
    assert len(base_fails) == 1


def test_automap_sees_conditional_and_aggregate_columns(spark):
    from schema_enforcer_spark.binding import ManifestRegistry
    from schema_enforcer_spark.manifest import Manifest, Rule

    m = Manifest(
        id="schemas/cond_agg",
        rules=(
            Rule(kind="conditional", params={"when": {"column": "role", "equals": "tool"}, "then": {"column": "tool", "required": True}}),
            Rule(kind="aggregate", params={"left": {"fn": "count", "column": "text"}, "operator": "lte", "right": 5}),
        ),
    )
    reg = ManifestRegistry([m])
    assert [x.id for x in reg.automap(["role", "tool", "conv_id"])] == ["schemas/cond_agg"]
    assert reg.automap(["unrelated"]) == []
