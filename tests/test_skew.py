"""Skew handling: salted two-phase aggregation gives identical results to
the direct groupBy on a hot-conversation mix."""

from __future__ import annotations

import pytest

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.manifest import Manifest, Rule
from schema_enforcer_spark.synth import gen_transcripts


@pytest.fixture(scope="module")
def skewed(spark):
    # 2 hot conversations with 1500 turns vs ~10-turn median
    df = gen_transcripts(spark, n_convs=40, seed=42, hot_convs=2, hot_turns=1500).cache()
    df.count()
    return df


def _agg_manifest(salt=None):
    params = {
        "group_by": ["conv_id"],
        "left": {"fn": "count", "filter": "role = 'assistant'"},
        "operator": "gte",
        "right": {"fn": "count", "filter": "role = 'tool'"},
    }
    if salt:
        params["salt"] = salt
    return Manifest(id="schemas/skew", rules=(Rule(kind="aggregate", params=params),))


def test_salted_equals_unsalted(spark, skewed):
    plain = {(v["absolute_path"][0], v["failing_value"]) for v in ValidationEngine(_agg_manifest()).violations(skewed).collect()}
    salted = {(v["absolute_path"][0], v["failing_value"]) for v in ValidationEngine(_agg_manifest(salt=8)).violations(skewed).collect()}
    assert salted == plain


def test_salted_sum_min_max_avg(spark, skewed):
    for fn, right in [("sum", 1), ("min", 0), ("max", 0), ("avg", 0.5)]:
        params = {
            "group_by": ["conv_id"],
            "left": {"fn": fn, "column": "turn_idx"},
            "operator": "gte",
            "right": right,
        }
        plain = ValidationEngine(Manifest(id="m", rules=(Rule(kind="aggregate", params=params),)))
        salted = ValidationEngine(Manifest(id="m", rules=(Rule(kind="aggregate", params={**params, "salt": 4}),)))
        p = {(v["absolute_path"][0], v["failing_value"]) for v in plain.violations(skewed).collect()}
        s = {(v["absolute_path"][0], v["failing_value"]) for v in salted.violations(skewed).collect()}
        assert p == s, fn


def test_salt_rejects_count_distinct(spark, skewed):
    params = {
        "group_by": ["conv_id"],
        "left": {"fn": "count_distinct", "column": "role"},
        "operator": "gte",
        "right": 1,
        "salt": 4,
    }
    eng = ValidationEngine(Manifest(id="m", rules=(Rule(kind="aggregate", params=params),)))
    with pytest.raises(ValueError, match="count_distinct"):
        eng.violations(skewed).collect()


def test_hot_conversation_windows_complete(spark, skewed):
    """The fused window pass must handle 1500-turn hot conversations (AQE
    skew-split can't break window partitions — they must fit and finish)."""
    m = Manifest(
        id="schemas/hot",
        rules=(
            Rule(kind="ordering", params={"column": "ts", "partition_by": ["conv_id"], "order_by": ["turn_idx"], "strictly": True}),
            Rule(kind="contiguous", params={"column": "turn_idx", "partition_by": ["conv_id"]}),
            Rule(kind="unique", params={"columns": ["conv_id", "turn_idx"]}),
        ),
    )
    assert ValidationEngine(m).violations(skewed).count() == 0
