"""Nested-document validation: dotted struct paths, per-element ``items``
rules, from_json ingestion — the reference's core JSONSchema-walk semantics
(/root/reference/tests/test_jsonschema.py:84-91 path parity, dns.yml schema
shape) re-expressed as Catalyst expressions, cross-checked against a real
jsonschema.Draft7Validator on the same documents."""

from __future__ import annotations

import jsonschema
import pytest
from pyspark.sql import functions as F

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.manifest import Manifest, Rule, manifest_from_dict
from schema_enforcer_spark.sources.table_io import with_json_column


@pytest.fixture(scope="module")
def dns_df(spark):
    """The reference's dns_servers document shape: array of structs."""
    rows = [
        # hostname, dns_servers [(name, address, vrf)]
        ("h0", [("a", "10.1.1.1", None), ("b", "10.2.2.2", "mgmt")]),   # valid
        ("h1", [("a", "not-an-ip", None)]),                              # bad ipv4 at [0]
        ("h2", [("a", "10.1.1.1", None), ("b", None, None)]),           # missing address at [1]
        ("h3", None),                                                    # null array
        ("h4", []),                                                      # empty array
    ]
    return spark.createDataFrame(
        rows,
        "hostname string, dns_servers array<struct<name:string,address:string,vrf:string>>",
    ).cache()


DNS_MANIFEST = manifest_from_dict(
    {
        "id": "schemas/dns_servers",
        "table": "hosts",
        "rules": [
            {"kind": "required", "column": "dns_servers"},
            {"kind": "items", "column": "dns_servers", "field": "address", "check": "format", "format": "ipv4"},
            {"kind": "items", "column": "dns_servers", "field": "address", "check": "required"},
        ],
    }
)


def _eng():
    return ValidationEngine(DNS_MANIFEST, key_columns=["hostname"], instance_expr="hostname")


def test_items_rule_paths_and_messages(spark, dns_df):
    viols = {tuple(v["absolute_path"]): v for v in _eng().violations(dns_df).collect()}
    # bad ipv4 at h1/dns_servers/0/address — reference path shape
    bad_ip = viols[("h1", "dns_servers", "0", "address")]
    assert bad_ip["message"] == "'not-an-ip' is not a 'ipv4'"
    assert bad_ip["failing_value"] == "not-an-ip"
    # missing required field anchors at the element (jsonschema names the key)
    missing = viols[("h2", "dns_servers", "1")]
    assert missing["message"] == "'address' is a required property"
    # null array → required rule on the column, no items explosion
    assert ("h3", "dns_servers") in viols
    # empty array and fully-valid rows produce nothing else
    assert len(viols) == 3


def test_items_matches_draft7_validator(spark, dns_df):
    """Engine FAIL-count per document == Draft7Validator error count on the
    same JSON documents (type errors excluded: parquet is typed already)."""
    schema = {
        "type": "object",
        "properties": {
            "dns_servers": {
                "type": "array",
                "items": {
                    "type": "object",
                    "properties": {"address": {"type": "string", "format": "ipv4"}},
                    "required": ["address"],
                },
            }
        },
        "required": ["dns_servers"],
    }
    validator = jsonschema.Draft7Validator(schema, format_checker=jsonschema.FormatChecker())
    docs = {
        r["hostname"]: {
            **({} if r["dns_servers"] is None else {
                "dns_servers": [
                    {k: v for k, v in row.asDict().items() if v is not None and k != "vrf" and k != "name"}
                    for row in r["dns_servers"]
                ]
            })
        }
        for r in dns_df.collect()
    }
    expected = {h: len(list(validator.iter_errors(d))) for h, d in docs.items()}
    got = {
        r["instance_name"]: r["n_violations"]
        for r in _eng().validate(dns_df).verdicts.collect()
    }
    for h, n in expected.items():
        assert got.get(h, 0) == n, f"{h}: engine={got.get(h)} jsonschema={n} doc={docs[h]}"


def test_dotted_struct_path_rules(spark):
    df = spark.createDataFrame(
        [(1, ("alice", 17)), (2, ("bob", 34)), (3, (None, 50)), (4, None)],
        "id bigint, profile struct<name:string,age:int>",
    )
    m = manifest_from_dict(
        {
            "id": "schemas/profiles",
            "table": "users",
            "rules": [
                {"kind": "required", "column": "profile.name"},
                {"kind": "range", "column": "profile.age", "minimum": 18},
            ],
        }
    )
    eng = ValidationEngine(m, key_columns=["id"], instance_expr="'users'")
    viols = {tuple(v["absolute_path"]): v for v in eng.violations(df).collect()}
    assert viols[("1", "profile", "age")]["message"] == "17 is less than the minimum of 18"
    assert viols[("3", "profile", "name")]["message"] == "'name' is a required property"
    # a null struct fails nested required (field of null struct is null)
    assert ("4", "profile", "name") in viols
    assert len(viols) == 3


def test_from_json_ingestion_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5, "tags": ["a", "b"]}'), (2, '{"k": 9000}'), (3, "not json"), (4, None)],
        "id bigint, props string",
    )
    parsed = with_json_column(df, "props", "k int, tags array<string>", target="payload")
    m = manifest_from_dict(
        {
            "id": "schemas/payloads",
            "table": "events",
            "rules": [
                {"kind": "required", "column": "payload"},
                {"kind": "range", "column": "payload.k", "maximum": 100},
            ],
        }
    )
    eng = ValidationEngine(m, key_columns=["id"], instance_expr="'events'")
    viols = sorted(
        (tuple(v["absolute_path"]), v["message"]) for v in eng.violations(parsed).collect()
    )
    assert (("2", "payload", "k"), "9000 is greater than the maximum of 100") in viols
    # unparseable and null JSON both fail the struct-level required rule
    assert (("3", "payload"), "'payload' is a required property") in viols
    assert (("4", "payload"), "'payload' is a required property") in viols
    assert len(viols) == 3


def test_items_scalar_elements(spark):
    """items without 'field': check each scalar element directly."""
    df = spark.createDataFrame(
        [(1, ["10.0.0.1", "bad"]), (2, ["10.0.0.2"])],
        "id bigint, servers array<string>",
    )
    m = manifest_from_dict(
        {
            "id": "schemas/servers",
            "table": "t",
            "rules": [{"kind": "items", "column": "servers", "check": "format", "format": "ipv4"}],
        }
    )
    eng = ValidationEngine(m, key_columns=["id"], instance_expr="'t'")
    viols = eng.violations(df).collect()
    assert len(viols) == 1
    assert viols[0]["absolute_path"] == ["1", "servers", "1"]
    assert viols[0]["message"] == "'bad' is not a 'ipv4'"


def test_strict_columns_nested(spark):
    """additionalProperties below top level: a struct (or array<struct>)
    column's schema fields are diffed against the declared set — message
    parity with the reference's strict mode."""
    df = spark.createDataFrame(
        [(1, ("a", 2, "x"), [("y", 1)])],
        "id bigint, profile struct<name:string,age:int,rogue:string>, "
        "servers array<struct<address:string,extra:int>>",
    )
    m = manifest_from_dict(
        {
            "id": "schemas/strict_nested",
            "table": "t",
            "rules": [
                {"kind": "strict_columns", "column": "profile", "columns": ["name", "age"]},
                {"kind": "strict_columns", "column": "servers", "columns": ["address"]},
            ],
        }
    )
    eng = ValidationEngine(m, key_columns=["id"], instance_expr="'t'")
    viols = {tuple(v["absolute_path"]): v["message"] for v in eng.violations(df).collect()}
    assert viols[("profile", "rogue")] == "Additional properties are not allowed ('rogue' was unexpected)"
    assert ("servers", "items", "extra") in viols
    assert len(viols) == 2
    # verdicts surface the table-grain FAIL
    rep = eng.validate(df)
    assert not rep.passes()
