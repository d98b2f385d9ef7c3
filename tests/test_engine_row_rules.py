"""Row-rule engine tests: every FIXTURES.md §3 defect case produces exactly
the expected violation rows, clean data produces all-PASS verdicts, and a
real jsonschema.Draft7Validator cross-checks our messages (SURVEY.md §5 —
mirrors the reference's golden-test harness,
/root/reference/schema_enforcer/schemas/manager.py:185-256)."""

from __future__ import annotations

import jsonschema
import pytest

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.synth import INJECTION_KEYS, inject


def _engine(base_manifest):
    return ValidationEngine(base_manifest)


def _row_only(manifest):
    """Manifest restricted to row rules + conditionals (no table-grain)."""
    from schema_enforcer_spark.manifest import Manifest

    keep = tuple(r for r in manifest.rules if r.is_row_rule or r.kind == "conditional")
    return Manifest(id=manifest.id, rules=keep, table=manifest.table, columns=manifest.columns)


def test_clean_data_all_pass(spark, transcripts, base_manifest):
    report = _engine(base_manifest).validate(transcripts)
    assert report.violations.count() == 0
    verdicts = report.verdicts.collect()
    assert len(verdicts) > 0
    assert all(v["result"] == "PASS" for v in verdicts)
    assert report.passes()


def test_invalid_enum(spark, transcripts, base_manifest):
    df = inject(transcripts, "invalid_enum")
    viols = ValidationEngine(_row_only(base_manifest)).violations(df).collect()
    (conv, turn), = INJECTION_KEYS["invalid_enum"]
    assert len(viols) == 1
    v = viols[0]
    assert v["schema_id"].endswith("/enum/role")
    assert v["absolute_path"] == [conv, str(turn), "role"]
    assert v["failing_value"] == "operator"
    assert v["message"] == "'operator' is not one of ['system', 'user', 'assistant', 'tool']"


def test_missing_required(spark, transcripts, base_manifest):
    df = inject(transcripts, "missing_required")
    viols = ValidationEngine(_row_only(base_manifest)).violations(df).collect()
    msgs = sorted(v["message"] for v in viols)
    assert msgs == ["'role' is a required property", "'text' is a required property"]


def test_invalid_pattern(spark, transcripts, base_manifest):
    df = inject(transcripts, "invalid_pattern")
    viols = ValidationEngine(_row_only(base_manifest)).violations(df).collect()
    assert len(viols) == 1
    v = viols[0]
    assert v["failing_value"] == "Bad-Tool!"
    assert v["message"] == "'Bad-Tool!' does not match '^[a-z][a-z0-9_]{0,63}$'"


def test_out_of_range(spark, transcripts, base_manifest):
    df = inject(transcripts, "out_of_range")
    viols = ValidationEngine(_row_only(base_manifest)).violations(df).collect()
    assert len(viols) == 1
    assert viols[0]["message"] == "-1 is less than the minimum of 0"


def test_conditional_tool_required(spark, transcripts, base_manifest):
    # break: a 'tool' role turn with NULL tool
    from pyspark.sql import functions as F

    df = transcripts.withColumn(
        "tool",
        F.when((F.col("conv_id") == "conv-00000009") & (F.col("role") == "tool"), F.lit(None)).otherwise(F.col("tool")),
    )
    viols = ValidationEngine(_row_only(base_manifest)).violations(df).collect()
    assert all(v["message"] == "'tool' is a required property" for v in viols)
    n_tool_turns = df.filter("conv_id = 'conv-00000009' and role = 'tool'").count()
    assert len(viols) == n_tool_turns


def test_conditional_with_else_branch(spark):
    """Draft-7 if/then/else: `otherwise` fires exactly when `when` does not
    hold — tool turns need a tool name, all OTHER roles must leave it null."""
    from pyspark.sql import functions as F

    from schema_enforcer_spark.manifest import manifest_from_dict

    rows = [
        (0, "tool", "web_search"),   # pass (then)
        (1, "tool", None),           # FAIL then: required
        (2, "user", None),           # pass (else)
        (3, "user", "stray_tool"),   # FAIL else: must be null
    ]
    df = spark.createDataFrame(rows, "id long, role string, tool string")
    m = manifest_from_dict(
        {
            "id": "schemas/ite",
            "rules": [
                {
                    "kind": "conditional",
                    "when": {"column": "role", "equals": "tool"},
                    "then": {"column": "tool", "required": True},
                    "otherwise": {"column": "tool", "is_null": True},
                }
            ],
        }
    )
    viols = {
        int(v["absolute_path"][0]): v
        for v in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    assert set(viols) == {1, 3}
    assert viols[1]["message"] == "'tool' is a required property"
    assert viols[3]["message"] == "'stray_tool' is not of type 'null'"
    assert viols[3]["failing_value"] == "stray_tool"


def test_verdict_fail_partition_only(spark, transcripts, base_manifest):
    df = inject(transcripts, "invalid_enum")
    eng = ValidationEngine(_row_only(base_manifest))
    report = eng.validate(df)
    verdicts = {v["instance_name"]: v["result"] for v in report.verdicts.collect()}
    viol = report.violations.collect()[0]
    assert verdicts[viol["instance_name"]] == "FAIL"
    assert sum(1 for r in verdicts.values() if r == "FAIL") == 1
    assert not report.passes()


# ---------------------------------------------------------------------------
# jsonschema oracle cross-check: run a real Draft7Validator over the rows the
# engine flagged (and a sample it didn't) and compare messages + paths.
# ---------------------------------------------------------------------------

TURN_JSONSCHEMA = {
    "type": "object",
    "required": ["conv_id", "turn_idx", "role", "text", "ts"],
    "properties": {
        "conv_id": {"type": "string", "pattern": "^conv-[0-9]{8}$"},
        "turn_idx": {"type": "integer", "minimum": 0},
        "role": {"enum": ["system", "user", "assistant", "tool"]},
        "text": {"type": "string", "minLength": 1, "maxLength": 8000},
        "tool": {"type": "string", "pattern": "^[a-z][a-z0-9_]{0,63}$"},
    },
}


def _to_instance(row) -> dict:
    # NULL column ≈ missing property at table grain (SURVEY.md §2.2 P6)
    d = {k: row[k] for k in ("conv_id", "turn_idx", "role", "text", "tool") if row[k] is not None}
    if row["ts"] is not None:
        d["ts"] = str(row["ts"])
    return d


@pytest.mark.parametrize("case", ["invalid_enum", "missing_required", "invalid_pattern", "out_of_range"])
def test_jsonschema_oracle_parity(spark, transcripts, base_manifest, case):
    df = inject(transcripts, case)
    eng = ValidationEngine(_row_only(base_manifest))
    viols = eng.violations(df).collect()
    validator = jsonschema.Draft7Validator(TURN_JSONSCHEMA)

    flagged_keys = {(v["absolute_path"][0], int(v["absolute_path"][1])) for v in viols}
    flagged_rows = df.filter(
        df.conv_id.isin([k[0] for k in flagged_keys])
    ).collect()

    oracle_msgs, engine_msgs = set(), {v["message"] for v in viols}
    for row in flagged_rows:
        if (row["conv_id"], row["turn_idx"]) not in flagged_keys:
            continue
        for err in validator.iter_errors(_to_instance(row)):
            oracle_msgs.add(err.message)
    assert engine_msgs == oracle_msgs


def test_oracle_no_false_positives(spark, transcripts, base_manifest):
    """Every clean row must also satisfy the jsonschema oracle."""
    validator = jsonschema.Draft7Validator(TURN_JSONSCHEMA)
    sample = transcripts.limit(200).collect()
    for row in sample:
        errs = list(validator.iter_errors(_to_instance(row)))
        assert errs == [], f"oracle flagged clean row {row}: {[e.message for e in errs]}"


def test_prefix_items_tuple_validation(spark):
    """Draft-7 tuple items + additionalItems: positional sub-checks at the
    element index, absent positions skipped, additional_items: false emits
    jsonschema's exact aggregate message (values repr'd, was/were), and a
    check-dict tail validates every element past the prefix."""
    from schema_enforcer_spark.manifest import manifest_from_dict

    df = spark.createDataFrame(
        [(0, [5, 1, 7, 3]), (1, [0]), (2, []), (3, None), (4, [0, 1])],
        "id long, arr array<long>",
    )
    m = manifest_from_dict(
        {
            "id": "prop",
            "table": "t",
            "rules": [
                {
                    "kind": "prefix_items",
                    "column": "arr",
                    "checks": [{"kind": "range", "maximum": 0}, {"kind": "enum", "values": [1]}],
                    "additional_items": False,
                }
            ],
        }
    )
    got = {
        (tuple(r["absolute_path"]), r["message"])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    assert got == {
        (("0", "arr", "0"), "5 is greater than the maximum of 0"),
        (("0", "arr"), "Additional items are not allowed (7, 3 were unexpected)"),
    }

    # singular pluralization + string element repr
    df2 = spark.createDataFrame([(0, ["ok", "zz"])], "id long, arr array<string>")
    m2 = manifest_from_dict(
        {
            "id": "prop",
            "table": "t",
            "rules": [
                {
                    "kind": "prefix_items",
                    "column": "arr",
                    "checks": [{"kind": "enum", "values": ["ok"]}],
                    "additional_items": False,
                }
            ],
        }
    )
    msgs = {r["message"] for r in ValidationEngine(m2, key_columns=["id"]).violations(df2).collect()}
    assert msgs == {"Additional items are not allowed ('zz' was unexpected)"}

    # additional_items as a CHECK DICT: tail elements validated per index
    m3 = manifest_from_dict(
        {
            "id": "prop",
            "table": "t",
            "rules": [
                {
                    "kind": "prefix_items",
                    "column": "arr",
                    "checks": [{"kind": "range", "maximum": 0}],
                    "additional_items": {"kind": "range", "minimum": 100},
                }
            ],
        }
    )
    got3 = {
        (tuple(r["absolute_path"]), r["message"])
        for r in ValidationEngine(m3, key_columns=["id"]).violations(df).collect()
    }
    assert got3 == {
        (("0", "arr", "0"), "5 is greater than the maximum of 0"),
        (("0", "arr", "1"), "1 is less than the minimum of 100"),
        (("0", "arr", "2"), "7 is less than the minimum of 100"),
        (("0", "arr", "3"), "3 is less than the minimum of 100"),
        (("4", "arr", "1"), "1 is less than the minimum of 100"),
    }


def test_prefix_items_manifest_validation(spark):
    """Meta-validation: non-composable sub-kind and missing sub-params are
    rejected at manifest load, not at plan build."""
    from schema_enforcer_spark.manifest import InvalidManifest, manifest_from_dict

    with pytest.raises(InvalidManifest, match="scalar row-rule kind"):
        manifest_from_dict(
            {
                "id": "x",
                "table": "t",
                "rules": [
                    {"kind": "prefix_items", "column": "a", "checks": [{"kind": "items", "check": "range"}]}
                ],
            }
        )
    with pytest.raises(InvalidManifest, match="requires field"):
        manifest_from_dict(
            {
                "id": "x",
                "table": "t",
                "rules": [{"kind": "prefix_items", "column": "a", "checks": [{"kind": "enum"}]}],
            }
        )
    with pytest.raises(InvalidManifest, match="additional_items"):
        manifest_from_dict(
            {
                "id": "x",
                "table": "t",
                "rules": [
                    {
                        "kind": "prefix_items",
                        "column": "a",
                        "checks": [{"kind": "range", "maximum": 1}],
                        "additional_items": {"kind": "nope"},
                    }
                ],
            }
        )


# ---------------------------------------------------------------------------
# expression rule: declarative SQL boolean over the whole row (the
# Spark-native twin of the reference's custom-validator subclasses,
# /root/reference/schema_enforcer/validator.py:90-117)
# ---------------------------------------------------------------------------


def _expr_manifest(expr, **extra):
    from schema_enforcer_spark.manifest import manifest_from_dict

    return manifest_from_dict(
        {
            "id": "schemas/expr_test",
            "table": "transcripts",
            "rules": [{"kind": "expression", "expr": expr, **extra}],
        }
    )


def test_expression_rule_cross_column(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, "user", "hi", None),
            ("a", 2, "tool", "", "search"),  # tool turn with empty text
            ("b", 1, "assistant", None, None),  # NULL text -> NULL pred -> PASS
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    m = _expr_manifest("NOT (role = 'tool' AND length(text) = 0)", column="text")
    viols = ValidationEngine(m, key_columns=["conv_id", "turn_idx"]).violations(df).collect()
    assert len(viols) == 1
    v = viols[0]
    assert v["absolute_path"] == ["a", "2", "text"]
    assert v["failing_value"] == "''"
    assert v["message"] == 'does not satisfy "NOT (role = \'tool\' AND length(text) = 0)"'
    assert v["schema_id"] == "schemas/expr_test/expression/text"


def test_expression_rule_null_passes_custom_message(spark):
    """SQL CHECK-constraint semantics: a NULL predicate result passes."""
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5)], "conv_id string, turn_idx int, n int"
    )
    m = _expr_manifest("n < 3", message="n out of policy")
    viols = ValidationEngine(m).violations(df).collect()
    assert len(viols) == 1  # only the non-null failing row
    assert viols[0]["message"] == "n out of policy"
    assert viols[0]["failing_value"] is None  # no render column bound


def test_expression_rule_rejects_bad_shapes(spark):
    df = spark.createDataFrame([("a", 1)], "conv_id string, turn_idx int")
    with pytest.raises(Exception, match="non-empty SQL string"):
        _expr_manifest("   ")
    with pytest.raises(Exception, match="statement list"):
        _expr_manifest("1=1; DROP TABLE x")
    with pytest.raises(ValueError, match="must be a SQL boolean"):
        ValidationEngine(_expr_manifest("conv_id")).violations(df).collect()
    with pytest.raises(Exception, match="nope_col"):
        ValidationEngine(_expr_manifest("nope_col > 1")).violations(df).collect()
    with pytest.raises(ValueError, match="which the input lacks"):
        ValidationEngine(_expr_manifest("turn_idx > 0", column="ghost")).violations(df).collect()


def test_expression_rule_not_composable(spark):
    from schema_enforcer_spark.manifest import manifest_from_dict

    with pytest.raises(Exception, match="expression|composable|scalar"):
        manifest_from_dict(
            {
                "id": "s/x",
                "rules": [
                    {
                        "kind": "any_of",
                        "column": "n",
                        "checks": [{"kind": "expression", "expr": "n > 1"}],
                    }
                ],
            }
        )


def test_enum_suggestion(spark):
    from schema_enforcer_spark.manifest import manifest_from_dict

    df = spark.createDataFrame(
        [(1, "usr"), (2, "assistent"), (3, "user"), (4, None), (5, "zzz")],
        "id long, role string",
    )
    values = ["system", "user", "assistant", "tool"]
    m = manifest_from_dict(
        {
            "id": "schemas/sg",
            "rules": [{"kind": "enum", "column": "role", "values": values, "suggest": True}],
        }
    )
    eng = ValidationEngine(m, key_columns=["id"], instance_expr="'t'")
    out = {v["failing_value"]: v["message"] for v in eng.violations(df).collect()}
    base = f"is not one of {values!r}"
    assert out["usr"] == f"'usr' {base} (did you mean 'user'?)"
    assert out["assistent"] == f"'assistent' {base} (did you mean 'assistant'?)"
    # NULL and valid values emit nothing; ties break on the rendered literal
    assert set(out) == {"usr", "assistent", "zzz"}
    assert "(did you mean '" in out["zzz"]
    # default OFF: the bare message stays byte-identical to jsonschema's
    m2 = manifest_from_dict(
        {
            "id": "schemas/sg2",
            "rules": [{"kind": "enum", "column": "role", "values": values}],
        }
    )
    out2 = ValidationEngine(m2, key_columns=["id"], instance_expr="'t'").violations(df).collect()
    assert all(v["message"].endswith(f"{values!r}") for v in out2)
