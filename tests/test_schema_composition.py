"""Draft-7 composition keywords (anyOf/allOf/oneOf/not — jsonschema
_validators.py) plus const / contains / dependentRequired, cross-checked
against a real Draft7Validator the same way test_property_based.py does.
The reference validates these through jsonschema itself
(/root/reference/schema_enforcer/schemas/jsonschema.py:90-101); here they
compile to boolean Catalyst expressions in one projection."""

from __future__ import annotations

import jsonschema
import pytest

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.manifest import (
    InvalidManifest,
    Manifest,
    Rule,
    manifest_from_dict,
)


def _flagged(spark, rules, rows, ddl="id long, v string"):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)], ddl)
    m = Manifest(id="comp", rules=tuple(rules))
    return {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }


def _oracle(schema, rows):
    v = jsonschema.Draft7Validator(schema)
    out = set()
    for i, val in enumerate(rows):
        inst = {} if val is None else {"v": val}
        if any(True for _ in v.iter_errors(inst)):
            out.add(i)
    return out


ROWS = [None, "", "abc", "abcdef", "xy-zw", "hello world", "abc abc", "zzzz"]


def test_any_of_matches_jsonschema(spark):
    rules = [
        Rule(
            kind="any_of",
            params={
                "column": "v",
                "checks": [
                    {"kind": "enum", "values": ["abc", "zzzz"]},
                    {"kind": "pattern", "pattern": "^hello"},
                ],
            },
        )
    ]
    schema = {
        "type": "object",
        "properties": {"v": {"anyOf": [{"enum": ["abc", "zzzz"]}, {"pattern": "^hello"}]}},
    }
    assert _flagged(spark, rules, ROWS) == _oracle(schema, ROWS)


def test_all_of_matches_jsonschema(spark):
    # conjunction: 'abc' passes both checks; 'zzzz' passes the enum but not
    # the pattern; 'hello world' passes neither
    rules = [
        Rule(
            kind="all_of",
            params={
                "column": "v",
                "checks": [
                    {"kind": "enum", "values": ["abc", "zzzz", "hello world"]},
                    {"kind": "pattern", "pattern": "^[a-z]+$"},
                ],
            },
        )
    ]
    schema = {
        "type": "object",
        "properties": {
            "v": {"allOf": [{"enum": ["abc", "zzzz", "hello world"]}, {"pattern": "^[a-z]+$"}]}
        },
    }
    assert _flagged(spark, rules, ROWS) == _oracle(schema, ROWS)


def test_one_of_matches_jsonschema(spark):
    # overlapping sub-schemas: 'abc' matches both (flagged), 'abcdef' only
    # the length check, 'zzzz' only the enum
    rules = [
        Rule(
            kind="one_of",
            params={
                "column": "v",
                "checks": [
                    {"kind": "enum", "values": ["abc", "zzzz"]},
                    {"kind": "length", "min_length": 3, "max_length": 6},
                ],
            },
        )
    ]
    schema = {
        "type": "object",
        "properties": {
            "v": {"oneOf": [{"enum": ["abc", "zzzz"]}, {"minLength": 3, "maxLength": 6}]}
        },
    }
    assert _flagged(spark, rules, ROWS) == _oracle(schema, ROWS)


def test_not_matches_jsonschema(spark):
    rules = [
        Rule(
            kind="not",
            params={"column": "v", "checks": [{"kind": "pattern", "pattern": "abc"}]},
        )
    ]
    schema = {"type": "object", "properties": {"v": {"not": {"pattern": "abc"}}}}
    assert _flagged(spark, rules, ROWS) == _oracle(schema, ROWS)


def test_const_matches_jsonschema(spark):
    rules = [Rule(kind="const", params={"column": "v", "value": "abc"})]
    schema = {"type": "object", "properties": {"v": {"const": "abc"}}}
    assert _flagged(spark, rules, ROWS) == _oracle(schema, ROWS)
    # message parity: jsonschema renders "%r was expected"
    df = spark.createDataFrame([(0, "nope")], "id long, v string")
    m = Manifest(id="comp", rules=tuple(rules))
    [v] = ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    assert v["message"] == "'abc' was expected"


def test_contains_matches_jsonschema(spark):
    rows = [None, [], [1, 2], [5, 60], [100], [0, -3]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "id long, v array<long>"
    )
    m = Manifest(
        id="comp",
        rules=(Rule(kind="contains", params={"column": "v", "check": "range", "minimum": 50}),),
    )
    flagged = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    v = jsonschema.Draft7Validator(
        {"type": "object", "properties": {"v": {"contains": {"minimum": 50}}}}
    )
    expect = {
        i
        for i, val in enumerate(rows)
        if val is not None and any(True for _ in v.iter_errors({"v": val}))
    }
    assert flagged == expect


def test_contains_null_elements_match_jsonschema(spark):
    """Existential checks invert NULL leniency: a null element must not
    vacuously satisfy contains for null-constraining sub-keywords (enum),
    while value-domain sub-checks (range) keep jsonschema's
    non-applicable-instance pass."""
    rows = [[None], [None, "x"], [None, "a"], ["x"], []]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "id long, v array<string>"
    )
    m = Manifest(
        id="comp",
        rules=(Rule(kind="contains", params={"column": "v", "check": "enum", "values": ["a"]}),),
    )
    flagged = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    v = jsonschema.Draft7Validator(
        {"type": "object", "properties": {"v": {"contains": {"enum": ["a"]}}}}
    )
    expect = {
        i for i, val in enumerate(rows) if any(True for _ in v.iter_errors({"v": val}))
    }
    assert flagged == expect  # [None] and [None,'x'] and [] flagged; [None,'a'] not


def test_dependent_required_matches_jsonschema(spark):
    rows = [
        ("tool_call", "web_search"),
        ("tool_call", None),
        (None, None),
        (None, "orphan_tool"),
        ("plain", "calc"),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "id long, kind string, tool string"
    )
    m = Manifest(
        id="comp",
        rules=(Rule(kind="dependent_required", params={"column": "kind", "requires": ["tool"]}),),
    )
    out = ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    flagged = {int(r["absolute_path"][0]) for r in out}
    v = jsonschema.Draft7Validator({"type": "object", "dependencies": {"kind": ["tool"]}})
    expect = set()
    for i, (a, b) in enumerate(rows):
        inst = {}
        if a is not None:
            inst["kind"] = a
        if b is not None:
            inst["tool"] = b
        if any(True for _ in v.iter_errors(inst)):
            expect.add(i)
    assert flagged == expect
    assert all(r["message"] == "'tool' is a dependency of 'kind'" for r in out)


def test_composition_meta_validation():
    # nested composition is rejected, as are missing sub-params
    with pytest.raises(InvalidManifest, match="scalar row-rule kind"):
        manifest_from_dict(
            {
                "id": "m",
                "rules": [
                    {"kind": "any_of", "column": "v", "checks": [{"kind": "any_of", "checks": []}]}
                ],
            }
        )
    with pytest.raises(InvalidManifest, match="requires field 'values'"):
        manifest_from_dict(
            {"id": "m", "rules": [{"kind": "one_of", "column": "v", "checks": [{"kind": "enum"}]}]}
        )
    with pytest.raises(InvalidManifest, match="at least one bound"):
        manifest_from_dict(
            {"id": "m", "rules": [{"kind": "not", "column": "v", "checks": [{"kind": "range"}]}]}
        )
    with pytest.raises(InvalidManifest, match="requires field 'requires'"):
        manifest_from_dict(
            {"id": "m", "rules": [{"kind": "dependent_required", "column": "v"}]}
        )
    with pytest.raises(InvalidManifest, match="scalar row-rule kind"):
        manifest_from_dict(
            {"id": "m", "rules": [{"kind": "contains", "column": "v", "check": "items"}]}
        )


def test_pattern_properties_matches_jsonschema(spark):
    """Draft-7 patternProperties over a map column (the reference's
    interface-name maps): matching keys get the sub-check on their value,
    additional_properties: false rejects non-matching keys — row verdicts
    agree with Draft7Validator."""
    docs = [
        None,
        {"swp1": 10, "swp2": 20},          # all match, all in range
        {"swp1": 99},                      # matching key, value out of range
        {"eth0": 10},                      # non-matching key
        {"swp3": 10, "eth1": 5},           # mixed
        {},
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, v map<string,long>"
    )
    rules = (
        Rule(
            kind="pattern_properties",
            params={
                "column": "v",
                "pattern": "^swp",
                "check": "range",
                "maximum": 50,
                "additional_properties": False,
            },
        ),
    )
    m = Manifest(id="comp", rules=rules)
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    schema = {
        "type": "object",
        "properties": {
            "v": {
                "type": "object",
                "patternProperties": {"^swp": {"maximum": 50}},
                "additionalProperties": False,
            }
        },
    }
    v = jsonschema.Draft7Validator(schema)
    expected = set()
    for i, d in enumerate(docs):
        inst = {} if d is None else {"v": d}
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert got == expected

    # message + path parity on the single-extra case (jsonschema
    # additionalProperties message format)
    rows = ValidationEngine(m, key_columns=["id"]).violations(df.filter("id = 3")).collect()
    [r] = rows
    assert r["message"] == "Additional properties are not allowed ('eth0' was unexpected)"
    assert list(r["absolute_path"]) == ["3", "v", "eth0"]


def test_pattern_properties_struct_field(spark):
    """field= digs into struct values: every matching interface's `role`
    must be in the enum; path carries [column, key, field]."""
    df = spark.createDataFrame(
        [
            (0, {"swp1": ("uplink", 100)}),
            (1, {"swp1": ("wat", 100), "mgmt0": ("oob", 10)}),
        ],
        "id long, v map<string,struct<role:string,speed:long>>",
    )
    rules = (
        Rule(
            kind="pattern_properties",
            params={
                "column": "v",
                "pattern": "^swp",
                "field": "role",
                "check": "enum",
                "values": ["uplink", "downlink"],
            },
        ),
    )
    m = Manifest(id="comp", rules=rules)
    rows = ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    [r] = rows
    assert list(r["absolute_path"]) == ["1", "v", "swp1", "role"]
    assert r["message"] == "'wat' is not one of ['uplink', 'downlink']"
    assert r["failing_value"] == "wat"


def test_pattern_properties_meta_validation():
    # neither check nor additional_properties:false → checks nothing → error
    with pytest.raises(InvalidManifest, match="checks nothing"):
        manifest_from_dict(
            {
                "id": "m",
                "rules": [{"kind": "pattern_properties", "column": "v", "pattern": "^a"}],
            }
        )
    # sub-check params are enforced like items'
    with pytest.raises(InvalidManifest, match="requires field"):
        manifest_from_dict(
            {
                "id": "m",
                "rules": [
                    {"kind": "pattern_properties", "column": "v", "pattern": "^a", "check": "enum"}
                ],
            }
        )


def test_property_names_matches_jsonschema(spark):
    """Draft-7 propertyNames: the sub-check validates each map KEY;
    agreement with Draft7Validator plus message parity from the compiled
    sub-check ("'<key>' is too long")."""
    docs = [
        None,
        {"ab": 1},
        {"abcdefgh": 2},          # key too long
        {"ok": 1, "waytoolongkey": 2},
        {},
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, v map<string,long>"
    )
    rules = (
        Rule(
            kind="property_names",
            params={"column": "v", "check": "length", "max_length": 4},
        ),
    )
    m = Manifest(id="comp", rules=rules)
    out = ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    got = {int(r["absolute_path"][0]) for r in out}
    schema = {
        "type": "object",
        "properties": {"v": {"type": "object", "propertyNames": {"maxLength": 4}}},
    }
    v = jsonschema.Draft7Validator(schema)
    expected = set()
    for i, d in enumerate(docs):
        inst = {} if d is None else {"v": d}
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert got == expected
    by_key = {r["failing_value"]: r for r in out}
    assert by_key["abcdefgh"]["message"] == "'abcdefgh' is too long"
    assert list(by_key["waytoolongkey"]["absolute_path"]) == ["3", "v", "waytoolongkey"]

    # min/maxProperties falls out of `length` on the map (F.size = entries)
    m2 = Manifest(
        id="comp", rules=(Rule(kind="length", params={"column": "v", "min_length": 1}),)
    )
    flagged = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m2, key_columns=["id"]).violations(df).collect()
    }
    assert flagged == {4}  # only the empty map; NULL passes (required's job)


def test_type_object_matches_jsonschema(spark):
    """Draft-7 `type: object`: structs (fixed fields) and maps (dynamic
    keys) both count as objects; scalar columns fail the static check."""
    df = spark.createDataFrame(
        [(0, {"a": 1}, ("x",), "s")],
        "id long, m map<string,long>, st struct<f:string>, s string",
    )
    ok = Manifest(
        id="comp",
        rules=(
            Rule(kind="type", params={"column": "m", "type": "object"}),
            Rule(kind="type", params={"column": "st", "type": "object"}),
        ),
    )
    assert ValidationEngine(ok, key_columns=["id"]).violations(df).count() == 0
    bad = Manifest(id="comp", rules=(Rule(kind="type", params={"column": "s", "type": "object"}),))
    [r] = ValidationEngine(bad, key_columns=["id"]).violations(df).collect()
    assert r["message"] == "'s' is not of type 'object'"


def test_property_count_matches_jsonschema(spark):
    """Draft-7 minProperties/maxProperties over a map column: entry count
    bounded, NULL passes, row verdicts agree with Draft7Validator."""
    docs = [
        None,
        {},                                 # too few
        {"a": 1},
        {"a": 1, "b": 2},
        {"a": 1, "b": 2, "c": 3},           # too many
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, v map<string,long>"
    )
    m = Manifest(
        id="comp",
        rules=(
            Rule(
                kind="property_count",
                params={"column": "v", "min_properties": 1, "max_properties": 2},
            ),
        ),
    )
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    schema = {
        "type": "object",
        "properties": {"v": {"minProperties": 1, "maxProperties": 2}},
    }
    v = jsonschema.Draft7Validator(schema)
    expected = set()
    for i, d in enumerate(docs):
        inst = {} if d is None else {"v": d}
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert got == expected

    # message parity modulo container repr (JSON stands in for Python repr,
    # the unique_items/contains convention)
    by_id = {
        int(r["absolute_path"][0]): r["message"]
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    assert by_id[1] == "{} does not have enough properties"
    assert by_id[4].endswith(" has too many properties")


def test_property_count_single_bound_and_guards(spark):
    """min-only bound works; non-map column and missing bounds are
    manifest/compile errors."""
    df = spark.createDataFrame(
        [(0, {"a": 1}), (1, {})], "id long, v map<string,long>"
    )
    m = Manifest(
        id="comp",
        rules=(Rule(kind="property_count", params={"column": "v", "min_properties": 1}),),
    )
    rows = ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    assert [r["absolute_path"][0] for r in rows] == ["1"]

    with pytest.raises(InvalidManifest, match="min_properties and/or max_properties"):
        manifest_from_dict(
            {"id": "m", "rules": [{"kind": "property_count", "column": "v"}]}
        )
    with pytest.raises(InvalidManifest, match="non-negative integer"):
        manifest_from_dict(
            {"id": "m", "rules": [{"kind": "property_count", "column": "v", "min_properties": -1}]}
        )
    with pytest.raises(InvalidManifest, match="can never pass"):
        manifest_from_dict(
            {
                "id": "m",
                "rules": [
                    {"kind": "property_count", "column": "v", "min_properties": 3, "max_properties": 1}
                ],
            }
        )
    bad = Manifest(
        id="comp",
        rules=(Rule(kind="property_count", params={"column": "id", "min_properties": 1}),),
    )
    with pytest.raises(ValueError, match="not a map"):
        ValidationEngine(bad, key_columns=["id"]).violations(df).collect()


def test_pattern_properties_value_pattern(spark):
    """check: "pattern" must read the dedicated value_pattern param — the
    rule's own `pattern` matches KEYS, and silently reusing it for values
    validated 'uplink' against '^swp' (round-4 advisory). Agreement with
    Draft7Validator on distinct key/value regexes."""
    docs = [
        {"swp1": "uplink", "swp2": "downlink"},  # values match value_pattern
        {"swp1": "wat"},                          # matching key, bad value
        {"eth0": "wat"},                          # key doesn't match: ignored
        None,
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, v map<string,string>"
    )
    m = manifest_from_dict(
        {
            "id": "comp",
            "rules": [
                {
                    "kind": "pattern_properties",
                    "column": "v",
                    "pattern": "^swp",
                    "check": "pattern",
                    "value_pattern": "link$",
                }
            ],
        }
    )
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    schema = {
        "type": "object",
        "properties": {
            "v": {"type": "object", "patternProperties": {"^swp": {"pattern": "link$"}}}
        },
    }
    v = jsonschema.Draft7Validator(schema)
    expected = {
        i
        for i, d in enumerate(docs)
        if any(True for _ in v.iter_errors({} if d is None else {"v": d}))
    }
    assert got == expected

    # omitting value_pattern is the silent-key-regex-reuse trap — rejected
    with pytest.raises(InvalidManifest, match="value_pattern"):
        manifest_from_dict(
            {
                "id": "comp",
                "rules": [
                    {
                        "kind": "pattern_properties",
                        "column": "v",
                        "pattern": "^swp",
                        "check": "pattern",
                    }
                ],
            }
        )


def test_all_of_emits_failing_sub_message(spark):
    """jsonschema's allOf surfaces each failing sub-schema's OWN error, not
    an aggregate sentence — the compiled rule emits the first failing
    sub-check's message (round-4 advisory on message parity)."""
    from schema_enforcer_spark.engine import ValidationEngine as VE

    rules = (
        Rule(
            kind="all_of",
            params={
                "column": "v",
                "checks": [
                    {"kind": "length", "min_length": 4},
                    {"kind": "pattern", "pattern": "^[a-z]+$"},
                ],
            },
        ),
    )
    df = spark.createDataFrame([(0, "ab"), (1, "abcDE"), (2, "abcd")], "id long, v string")
    m = Manifest(id="comp", rules=rules)
    rows = {int(r["absolute_path"][0]): r["message"] for r in VE(m, key_columns=["id"]).violations(df).collect()}
    # row 0 fails the length sub-check first; jsonschema: "'ab' is too short"
    assert rows[0] == "'ab' is too short"
    # row 1 passes length, fails pattern; jsonschema: "'abcDE' does not match '^[a-z]+$'"
    assert rows[1] == "'abcDE' does not match '^[a-z]+$'"
    assert 2 not in rows
