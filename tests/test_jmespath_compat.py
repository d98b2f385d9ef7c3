"""Literal JMESPath expression strings in manifests — parity with the
reference's JmesPathModelValidation plugins
(/root/reference/schema_enforcer/schemas/validator.py:65-88). The two
fixture validators (tests/fixtures/test_validators/validators/
check_interfaces.py:15-23, check_interfaces_ipv4.py:8-15) are expressed
VERBATIM and cross-checked against the jmespath library evaluating the
same documents, including the falsy-LHS-passes gate (validator.py:79)."""

from __future__ import annotations

import pytest

jmespath = pytest.importorskip("jmespath")

from pyspark.sql import functions as F  # noqa: E402

from schema_enforcer_spark.engine import ValidationEngine  # noqa: E402
from schema_enforcer_spark.jmespath_compat import (  # noqa: E402
    UnsupportedJmesPath,
    jmespath_to_column,
    parse_checked,
)
from schema_enforcer_spark.manifest import InvalidManifest, manifest_from_dict  # noqa: E402

LEFT = "interfaces.*[@.type=='core'][] | length([?@])"
RIGHT_EXPR = "interfaces.* | length([?@.type=='core'][].ipv4)"

# one dict per host, mirroring the reference's per-document validation
HOSTS = [
    # 2 core, both with ipv4: passes both validators
    ("h0", {"ge0": ("core", "10.0.0.1"), "ge1": ("core", "10.0.0.2"), "ge2": ("access", None)}),
    # 1 core: fails CheckInterface (gte 2); core has ipv4 so IPv4 check passes
    ("h1", {"ge0": ("core", "10.0.1.1"), "ge1": ("access", None)}),
    # 2 core, one missing ipv4: fails CheckInterfaceIPv4 only
    ("h2", {"ge0": ("core", "10.0.2.1"), "ge1": ("core", None)}),
    # no core: LHS falsy → BOTH pass (validator.py:79 `if lhs:`)
    ("h3", {"ge0": ("access", None)}),
    # empty map: falsy → both pass
    ("h4", {}),
]


def _df(spark):
    rows = [
        (h, {k: {"type": t, "ipv4": ip} for k, (t, ip) in ifs.items()})
        for h, ifs in HOSTS
    ]
    return spark.createDataFrame(
        rows, "host string, interfaces map<string,struct<type:string,ipv4:string>>"
    )


def _ref_result(expr, host_ifs):
    """Evaluate with the reference's own engine: the jmespath library over
    the plain-dict document."""
    doc = {
        "interfaces": {
            k: ({"type": t, "ipv4": ip} if ip is not None else {"type": t})
            for k, (t, ip) in host_ifs.items()
        }
    }
    return jmespath.search(expr, doc)


def test_translation_matches_jmespath_library(spark):
    df = _df(spark)
    for expr in (LEFT, RIGHT_EXPR):
        col, dtype = jmespath_to_column(expr, df)
        got = {r["host"]: r["v"] for r in df.select("host", col.alias("v")).collect()}
        for h, ifs in HOSTS:
            assert got[h] == _ref_result(expr, ifs), (expr, h, got[h])


def test_check_interfaces_fixture_verbatim(spark):
    """CheckInterface: left/operator/right/error exactly as the reference
    fixture declares them."""
    m = manifest_from_dict(
        {
            "id": "CheckInterface",
            "table": "hosts",
            "rules": [
                {
                    "kind": "jmespath",
                    "left": LEFT,
                    "operator": "gte",
                    "right": 2,
                    "message": "Less than two core interfaces",
                }
            ],
        }
    )
    eng = ValidationEngine(m, key_columns=["host"], instance_expr="host")
    rows = eng.violations(_df(spark)).collect()
    assert {r["instance_name"] for r in rows} == {"h1"}
    assert rows[0]["message"] == "Less than two core interfaces"
    # failing_value carries the evaluated LHS like validation.py's context
    assert rows[0]["failing_value"] == "1"


def test_check_interfaces_ipv4_fixture_verbatim(spark):
    """CheckInterfaceIPv4: rhs is a SECOND compiled expression
    (check_interfaces_ipv4.py:14 jmespath.compile(...))."""
    m = manifest_from_dict(
        {
            "id": "CheckInterfaceIPv4",
            "table": "hosts",
            "rules": [
                {
                    "kind": "jmespath",
                    "left": LEFT,
                    "operator": "eq",
                    "right_expr": RIGHT_EXPR,
                    "message": "All core interfaces do not have IPv4 addresses",
                }
            ],
        }
    )
    eng = ValidationEngine(m, key_columns=["host"], instance_expr="host")
    rows = eng.violations(_df(spark)).collect()
    assert {r["instance_name"] for r in rows} == {"h2"}
    assert rows[0]["message"] == "All core interfaces do not have IPv4 addresses"


def test_reference_operator_semantics_per_document(spark):
    """Exhaustively mirror JmesPathModelValidation.validate for every host
    and both fixtures: engine verdict == reference Python logic."""
    operators = {
        "gt": lambda r, v: int(r) > int(v),
        "gte": lambda r, v: int(r) >= int(v),
        "eq": lambda r, v: r == v,
        "lt": lambda r, v: int(r) < int(v),
        "lte": lambda r, v: int(r) <= int(v),
    }
    df = _df(spark)
    for op in ("gt", "gte", "eq", "lt", "lte"):
        for right in (1, 2):
            m = manifest_from_dict(
                {
                    "id": "x",
                    "table": "hosts",
                    "rules": [
                        {"kind": "jmespath", "left": LEFT, "operator": op, "right": right}
                    ],
                }
            )
            eng = ValidationEngine(m, key_columns=["host"], instance_expr="host")
            got = {r["instance_name"] for r in eng.violations(df).collect()}
            expected = set()
            for h, ifs in HOSTS:
                lhs = _ref_result(LEFT, ifs)
                valid = True
                if lhs:  # reference validator.py:79
                    valid = operators[op](lhs, right)
                if not valid:
                    expected.add(h)
            assert got == expected, (op, right, got, expected)


def test_unsupported_constructs_rejected():
    # multi-select HASHES build objects — outside the subset (lists,
    # indexes, step-1 slices and the function set are all in it now)
    with pytest.raises(UnsupportedJmesPath, match="outside the compiled"):
        parse_checked("interfaces.{name: name}")
    # non-unit slice steps
    with pytest.raises(UnsupportedJmesPath, match="only step 1"):
        parse_checked("interfaces[::2]")
    # functions outside the whitelist (expression-refs never compile)
    with pytest.raises(UnsupportedJmesPath, match="not supported"):
        parse_checked("max_by(interfaces.*, &speed)")
    # syntax errors
    with pytest.raises(UnsupportedJmesPath, match="invalid JMESPath"):
        parse_checked("interfaces.[")
    # manifest meta-validation surfaces the same rejection pre-Spark
    with pytest.raises(InvalidManifest, match="outside the compiled"):
        manifest_from_dict(
            {
                "id": "x",
                "rules": [
                    {"kind": "jmespath", "left": "a.{x: @}", "operator": "eq", "right": 1}
                ],
            }
        )
    # exactly one of right / right_expr
    with pytest.raises(InvalidManifest, match="exactly one of"):
        manifest_from_dict(
            {"id": "x", "rules": [{"kind": "jmespath", "left": "a", "operator": "eq"}]}
        )


def test_rides_row_rule_projection(spark):
    """The jmespath rule composes with ordinary row rules in ONE violation
    pass and contributes to row_fail_count (streaming building block)."""
    df = _df(spark).withColumn("site", F.lit("dc1"))
    m = manifest_from_dict(
        {
            "id": "combo",
            "table": "hosts",
            "rules": [
                {"kind": "enum", "column": "site", "values": ["dc1", "dc2"]},
                {
                    "kind": "jmespath",
                    "left": LEFT,
                    "operator": "gte",
                    "right": 2,
                    "message": "Less than two core interfaces",
                },
            ],
        }
    )
    eng = ValidationEngine(m, key_columns=["host"], instance_expr="host")
    counts = {
        r["host"]: r["n"]
        for r in df.select("host", eng.row_fail_count(df).alias("n")).collect()
    }
    assert counts == {"h0": 0, "h1": 1, "h2": 0, "h3": 0, "h4": 0}
