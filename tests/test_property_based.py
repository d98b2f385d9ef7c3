"""Property-based correctness: for randomized rule parameters and row data,
the engine's per-row verdict must equal a real jsonschema Draft7Validator's
(hypothesis-driven; the reference has no property tests — SURVEY §5 — so
this strengthens the correctness case beyond its golden corpus)."""

from __future__ import annotations

import jsonschema
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.manifest import Manifest, Rule

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_text = st.text(alphabet="abcxyz- _", min_size=0, max_size=12)


def _run_engine(spark, rules, rows):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)], "id long, v string")
    m = Manifest(id="prop", rules=tuple(rules))
    flagged = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    return flagged


def _oracle(schema, rows):
    v = jsonschema.Draft7Validator(schema)
    out = set()
    for i, val in enumerate(rows):
        inst = {} if val is None else {"v": val}
        if any(True for _ in v.iter_errors(inst)):
            out.add(i)
    return out


@settings(**_SETTINGS)
@given(
    rows=st.lists(st.one_of(st.none(), _text), min_size=1, max_size=15),
    values=st.lists(_text, min_size=1, max_size=4, unique=True),
    required=st.booleans(),
)
def test_enum_required_matches_jsonschema(spark, rows, values, required):
    rules = [Rule(kind="enum", params={"column": "v", "values": list(values)})]
    schema = {"type": "object", "properties": {"v": {"enum": list(values)}}}
    if required:
        rules.append(Rule(kind="required", params={"column": "v"}))
        schema["required"] = ["v"]
    assert _run_engine(spark, rules, rows) == _oracle(schema, rows)


@settings(**_SETTINGS)
@given(
    rows=st.lists(st.one_of(st.none(), _text), min_size=1, max_size=15),
    min_len=st.integers(min_value=0, max_value=6),
    max_len=st.integers(min_value=6, max_value=14),
)
def test_length_matches_jsonschema(spark, rows, min_len, max_len):
    rules = [Rule(kind="length", params={"column": "v", "min_length": min_len, "max_length": max_len})]
    schema = {"type": "object", "properties": {"v": {"minLength": min_len, "maxLength": max_len}}}
    assert _run_engine(spark, rules, rows) == _oracle(schema, rows)


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.one_of(st.none(), st.integers(min_value=-50, max_value=50)), min_size=1, max_size=15),
    lo=st.integers(min_value=-20, max_value=0),
    hi=st.integers(min_value=0, max_value=20),
)
def test_range_matches_jsonschema(spark, vals, lo, hi):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v int")
    m = Manifest(id="prop", rules=(Rule(kind="range", params={"column": "v", "minimum": lo, "maximum": hi}),))
    flagged = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    schema = {"type": "object", "properties": {"v": {"minimum": lo, "maximum": hi}}}
    v = jsonschema.Draft7Validator(schema)
    expected = {
        i for i, val in enumerate(vals)
        if val is not None and any(True for _ in v.iter_errors({"v": val}))
    }
    assert flagged == expected


@settings(**_SETTINGS)
@given(rows=st.lists(st.one_of(st.none(), _text), min_size=1, max_size=15))
def test_pattern_matches_jsonschema(spark, rows):
    pattern = "^[a-c]+$"
    rules = [Rule(kind="pattern", params={"column": "v", "pattern": pattern})]
    schema = {"type": "object", "properties": {"v": {"pattern": pattern}}}
    assert _run_engine(spark, rules, rows) == _oracle(schema, rows)


@settings(**_SETTINGS)
@given(
    convs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=6)),
        min_size=1,
        max_size=20,
    )
)
def test_unique_rule_matches_set_semantics(spark, convs):
    """Fused-or-standalone unique: flagged keys == keys occurring > once."""
    df = spark.createDataFrame(
        [(f"c{c}", t) for c, t in convs], "conv_id string, turn_idx int"
    )
    m = Manifest(id="prop", rules=(Rule(kind="unique", params={"columns": ["conv_id", "turn_idx"]}),))
    viols = ValidationEngine(m).violations(df).collect()
    flagged = {tuple(v["absolute_path"]) for v in viols}
    from collections import Counter

    counts = Counter((f"c{c}", t) for c, t in convs)
    expected = {(c, str(t)) for (c, t), n in counts.items() if n > 1}
    assert flagged == expected


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.one_of(st.none(), st.integers(min_value=-40, max_value=40)),
                min_size=0,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=12,
    ),
    lo=st.integers(min_value=-15, max_value=0),
    hi=st.integers(min_value=0, max_value=15),
)
def test_items_range_matches_jsonschema(spark, docs, lo, hi):
    """Nested per-element validation: engine violation count per document ==
    Draft7Validator error count for {items: {minimum, maximum}} on randomized
    arrays (with nulls at both the array and element level)."""
    rows = [(i, v) for i, v in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, xs array<int>")
    m = Manifest(
        id="prop",
        rules=(
            Rule(kind="items", params={"column": "xs", "check": "range", "minimum": lo, "maximum": hi}),
        ),
    )
    got: dict[int, int] = {}
    for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect():
        got[int(r["absolute_path"][0])] = got.get(int(r["absolute_path"][0]), 0) + 1

    schema = {
        "type": "object",
        "properties": {"xs": {"type": "array", "items": {"minimum": lo, "maximum": hi}}},
    }
    v = jsonschema.Draft7Validator(schema)
    for i, xs in enumerate(docs):
        # engine semantics: null elements pass range (nullability is
        # `required`'s job) — mirror by dropping nulls for the oracle
        inst = {} if xs is None else {"xs": [x for x in xs if x is not None]}
        expected = sum(1 for _ in v.iter_errors(inst))
        assert got.get(i, 0) == expected, f"doc {i}: engine={got.get(i, 0)} jsonschema={expected} xs={xs}"


@settings(**_SETTINGS)
@given(
    rows=st.lists(st.one_of(st.none(), _text), min_size=1, max_size=12),
    enum_vals=st.lists(_text, min_size=1, max_size=3, unique=True),
    min_len=st.integers(min_value=0, max_value=6),
    max_len=st.integers(min_value=6, max_value=12),
    kind=st.sampled_from(["any_of", "all_of", "one_of", "not"]),
)
def test_composition_matches_jsonschema(spark, rows, enum_vals, min_len, max_len, kind):
    """Draft-7 anyOf/allOf/oneOf/not over randomized enum+length sub-schemas
    must agree with Draft7Validator row-for-row (the newest compiler
    surface)."""
    checks = [
        {"kind": "enum", "values": list(enum_vals)},
        {"kind": "length", "min_length": min_len, "max_length": max_len},
    ]
    sub_schemas = [
        {"enum": list(enum_vals)},
        {"minLength": min_len, "maxLength": max_len},
    ]
    rules = [Rule(kind=kind, params={"column": "v", "checks": checks})]
    key = {"any_of": "anyOf", "all_of": "allOf", "one_of": "oneOf", "not": "not"}[kind]
    schema_body = {key: sub_schemas} if kind != "not" else {"not": {"allOf": sub_schemas}}
    schema = {"type": "object", "properties": {"v": schema_body}}
    assert _run_engine(spark, rules, rows) == _oracle(schema, rows)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.one_of(
            st.none(),
            st.dictionaries(
                st.text(alphabet="abswp0", min_size=1, max_size=4),
                st.one_of(st.none(), st.integers(min_value=-50, max_value=150)),
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=10,
    ),
    hi=st.integers(min_value=0, max_value=100),
    reject=st.booleans(),
)
def test_pattern_properties_matches_jsonschema(spark, docs, hi, reject):
    """Randomized patternProperties over maps: matching keys' values range-
    checked, optional additionalProperties: false — row verdicts agree with
    Draft7Validator (null values dropped for the oracle per the engine-wide
    NULL-passes convention)."""
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, v map<string,long>"
    )
    params = {"column": "v", "pattern": "^s", "check": "range", "maximum": hi}
    if reject:
        params["additional_properties"] = False
    rules = [Rule(kind="pattern_properties", params=params)]
    m = Manifest(id="prop", rules=tuple(rules))
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    body = {"type": "object", "patternProperties": {"^s": {"maximum": hi}}}
    if reject:
        body["additionalProperties"] = False
    v = jsonschema.Draft7Validator({"type": "object", "properties": {"v": body}})
    expected = set()
    for i, d in enumerate(docs):
        inst = {} if d is None else {"v": {k: x for k, x in d.items() if x is not None}}
        # null-valued keys still exist for additionalProperties purposes
        if d is not None and reject:
            inst["v"].update({k: 0 for k, x in d.items() if x is None and not k.startswith("s")})
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert got == expected


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.one_of(
            st.none(),
            st.dictionaries(
                st.text(alphabet="abk", min_size=1, max_size=3),
                st.integers(min_value=0, max_value=9),
                max_size=5,
            ),
        ),
        min_size=1,
        max_size=10,
    ),
    mn=st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
    mx=st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
)
def test_property_count_matches_jsonschema(spark, docs, mn, mx):
    """Randomized minProperties/maxProperties bounds over random maps: row
    verdicts agree with Draft7Validator (NULL passes, per the engine-wide
    convention — jsonschema never validates a missing property)."""
    if mn is None and mx is None:
        mn = 0
    if mn is not None and mx is not None and mn > mx:
        mn, mx = mx, mn
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, v map<string,long>"
    )
    params = {"column": "v"}
    body = {}
    if mn is not None:
        params["min_properties"] = mn
        body["minProperties"] = mn
    if mx is not None:
        params["max_properties"] = mx
        body["maxProperties"] = mx
    m = Manifest(id="prop", rules=(Rule(kind="property_count", params=params),))
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    v = jsonschema.Draft7Validator({"type": "object", "properties": {"v": body}})
    expected = set()
    for i, d in enumerate(docs):
        inst = {} if d is None else {"v": d}
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert got == expected


# --- format rules vs Draft7Validator FORMAT_CHECKER ------------------------

_FMT_STRATEGIES = {
    # near-miss generators: mostly-plausible shapes with occasional
    # violations (out-of-range octets, bad calendar days, leap-second,
    # wrong separator) so the regex/checker boundary gets exercised
    "ipv4": st.lists(st.integers(min_value=0, max_value=300), min_size=3, max_size=5).map(
        lambda xs: ".".join(str(x) for x in xs)
    ),
    "ipv6": st.builds(
        lambda groups, cut: (
            ":".join(groups[:cut]) + "::" + ":".join(groups[cut:])
            if cut is not None
            else ":".join(groups)
        ),
        st.lists(
            st.text(alphabet="0123456789abcdefg", min_size=1, max_size=5),
            min_size=1,
            max_size=9,
        ),
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
    ),
    "date": st.builds(
        lambda y, m, d: f"{y:04d}-{m:02d}-{d:02d}",
        st.integers(min_value=1, max_value=9999),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=1, max_value=32),
    ),
    "time": st.builds(
        lambda h, mi, s, suf: f"{h:02d}:{mi:02d}:{s:02d}{suf}",
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=0, max_value=61),
        st.sampled_from(["Z", "z", "+05:00", "-23:59", "+24:00", ".123Z", ""]),
    ),
    "date-time": st.builds(
        lambda y, m, d, sep, h, suf: f"{y:04d}-{m:02d}-{d:02d}{sep}{h:02d}:20:30{suf}",
        st.integers(min_value=1900, max_value=2100),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=27, max_value=32),
        st.sampled_from(["T", "t", " ", "x"]),
        st.integers(min_value=0, max_value=24),
        st.sampled_from(["Z", "+05:00", "-23:30", ".5Z", ""]),
    ),
    "email": st.text(alphabet="ab@.-", min_size=0, max_size=8),
    "json-pointer": st.text(alphabet="/ab~01", min_size=0, max_size=8),
}


@settings(**_SETTINGS)
@given(data=st.data(), fmt=st.sampled_from(sorted(_FMT_STRATEGIES)))
def test_format_rules_match_format_checker(spark, data, fmt):
    """P7 formats vs jsonschema's FORMAT_CHECKER on hypothesis near-miss
    strings (the round-4 brief: the cheapest guard against regex drift).
    Only formats whose LOCAL checker is strict participate — a permissive
    checker (extras not installed) proves nothing. Divergences this test
    already caught and fixed: calendar-invalid dates (2021-02-30) and the
    full-form embedded-IPv4 address (1:2:3:4:5:6:1.2.3.4)."""
    checker = jsonschema.Draft7Validator.FORMAT_CHECKER
    _canary = {
        "ipv4": "999.1.1.1", "ipv6": "g::1", "date": "2021-13-40",
        "time": "25:00:00Z", "date-time": "2021-13-40T10:20:30Z",
        "email": "no-at-sign", "json-pointer": "not/a/pointer",
    }
    if checker.conforms(_canary[fmt], fmt):
        pytest.skip(f"local {fmt} checker is permissive (extras not installed)")
    rows = [data.draw(_FMT_STRATEGIES[fmt]) for _ in range(8)]
    rules = [Rule(kind="format", params={"column": "v", "format": fmt})]
    got = _run_engine(spark, rules, rows)
    schema = {"type": "object", "properties": {"v": {"format": fmt}}}
    v = jsonschema.Draft7Validator(schema, format_checker=checker)
    expected = {
        i for i, val in enumerate(rows) if any(True for _ in v.iter_errors({"v": val}))
    }
    assert got == expected, (fmt, [(rows[i], i in got, i in expected) for i in range(len(rows)) if (i in got) != (i in expected)])


# ---------------------------------------------------------------------------
# Composed random manifests: several rule kinds drawn JOINTLY
# ---------------------------------------------------------------------------
#
# The per-family tests above pin each rule kind against Draft7Validator in
# isolation; this one draws a random SUBSET of rules over two columns at
# once (interactions: several rules on one column, mixed grains of
# strictness, composition next to scalar rules) and goes through
# manifest_from_dict — the whitelist path a real manifest takes — so a
# param-name typo that Rule(...) would silently accept fails here.

_RM_PATTERNS = ["^a", "x$", "^[ab]+$", "c.-", "^ *$"]


def _draw_rule_pool(draw):
    """Returns (manifest rule dicts, equivalent jsonschema allOf branches)
    over columns s: string, n: long. Each drawn rule maps to one allOf
    branch, so the conjunction exactly mirrors the engine's rule list."""
    enum_vals = draw(st.lists(_text, min_size=1, max_size=3, unique=True))
    pat = draw(st.sampled_from(_RM_PATTERNS))
    mn, mx = draw(st.integers(0, 5)), draw(st.integers(5, 12))
    lo, hi = draw(st.integers(-20, 0)), draw(st.integers(0, 20))
    mult = draw(st.sampled_from([1, 2, 3, 5]))
    cv = draw(_text)
    comp_kind = draw(st.sampled_from(["any_of", "all_of", "one_of", "not"]))
    checks = [{"kind": "enum", "values": list(enum_vals)}, {"kind": "pattern", "pattern": pat}]
    subs = [{"enum": list(enum_vals)}, {"pattern": pat}]
    comp_key = {"any_of": "anyOf", "all_of": "allOf", "one_of": "oneOf"}.get(comp_kind)
    comp_body = {comp_key: subs} if comp_key else {"not": {"allOf": subs}}
    pool = [
        ({"kind": "enum", "column": "s", "values": list(enum_vals)},
         {"properties": {"s": {"enum": list(enum_vals)}}}),
        ({"kind": "pattern", "column": "s", "pattern": pat},
         {"properties": {"s": {"pattern": pat}}}),
        ({"kind": "length", "column": "s", "min_length": mn, "max_length": mx},
         {"properties": {"s": {"minLength": mn, "maxLength": mx}}}),
        ({"kind": "required", "column": "s"}, {"required": ["s"]}),
        ({"kind": "range", "column": "n", "minimum": lo, "maximum": hi},
         {"properties": {"n": {"minimum": lo, "maximum": hi}}}),
        ({"kind": "range", "column": "n", "exclusive_minimum": lo, "exclusive_maximum": hi},
         {"properties": {"n": {"exclusiveMinimum": lo, "exclusiveMaximum": hi}}}),
        ({"kind": "multiple_of", "column": "n", "multiple_of": mult},
         {"properties": {"n": {"multipleOf": mult}}}),
        ({"kind": "required", "column": "n"}, {"required": ["n"]}),
        ({"kind": "const", "column": "s", "value": cv},
         {"properties": {"s": {"const": cv}}}),
        ({"kind": comp_kind, "column": "s", "checks": checks},
         {"properties": {"s": comp_body}}),
    ]
    idx = draw(st.lists(st.integers(0, len(pool) - 1), min_size=1, max_size=5, unique=True))
    chosen = [pool[i] for i in idx]
    return [c[0] for c in chosen], {"type": "object", "allOf": [c[1] for c in chosen]}


@settings(**_SETTINGS)
@given(data=st.data())
def test_random_composed_manifest_matches_jsonschema(spark, data):
    from schema_enforcer_spark.manifest import manifest_from_dict

    rows = data.draw(
        st.lists(
            st.tuples(
                st.one_of(st.none(), _text),
                st.one_of(st.none(), st.integers(min_value=-25, max_value=25)),
            ),
            min_size=1,
            max_size=12,
        )
    )
    rule_dicts, schema = _draw_rule_pool(data.draw)
    m = manifest_from_dict({"id": "prop", "table": "t", "rules": rule_dicts})
    df = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(rows)], "id long, s string, n long"
    )
    flagged = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    v = jsonschema.Draft7Validator(schema)
    expected = set()
    for i, (s, n) in enumerate(rows):
        inst = {}
        if s is not None:
            inst["s"] = s
        if n is not None:
            inst["n"] = n
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert flagged == expected


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.one_of(st.none(), st.lists(st.integers(min_value=-30, max_value=30), max_size=6)),
        min_size=1,
        max_size=10,
    ),
    hi=st.integers(min_value=-5, max_value=5),
    enum_vals=st.lists(st.integers(min_value=-3, max_value=3), min_size=1, max_size=3, unique=True),
    tail=st.sampled_from(["open", "closed", "check"]),
)
def test_prefix_items_matches_jsonschema(spark, docs, hi, enum_vals, tail):
    """Randomized Draft-7 tuple items: positional range+enum prefix with an
    open/false/schema tail must agree with Draft7Validator row-for-row."""
    from schema_enforcer_spark.manifest import manifest_from_dict

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id long, v array<long>")
    rule = {
        "kind": "prefix_items",
        "column": "v",
        "checks": [
            {"kind": "range", "maximum": hi},
            {"kind": "enum", "values": list(enum_vals)},
        ],
    }
    body = {"items": [{"maximum": hi}, {"enum": list(enum_vals)}]}
    if tail == "closed":
        rule["additional_items"] = False
        body["additionalItems"] = False
    elif tail == "check":
        rule["additional_items"] = {"kind": "range", "minimum": 0}
        body["additionalItems"] = {"minimum": 0}
    m = manifest_from_dict({"id": "prop", "table": "t", "rules": [rule]})
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    v = jsonschema.Draft7Validator({"type": "object", "properties": {"v": body}})
    expected = {
        i
        for i, d in enumerate(docs)
        if d is not None and any(True for _ in v.iter_errors({"v": d}))
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
            st.one_of(st.none(), _text),
        ),
        min_size=1,
        max_size=12,
    ),
    trigger=st.sampled_from(["x", "y"]),
    then_kind=st.sampled_from(["required", "pattern", "equals"]),
    with_else=st.booleans(),
)
def test_conditional_rule_matches_jsonschema_if_then_else(spark, rows, trigger, then_kind, with_else):
    """The cross-column conditional rule vs Draft-7 if/then/else. Semantics
    mapping: the engine's `when: equals` triggers only when the column IS
    the value (null does not trigger), so the jsonschema `if` gets
    required+const; `then: equals` uses eqNullSafe (null fails), so the
    jsonschema `then` gets required+const too; `then: pattern` passes
    nulls on both sides."""
    from schema_enforcer_spark.manifest import manifest_from_dict

    when = {"column": "a", "equals": trigger}
    if_schema = {"properties": {"a": {"const": trigger}}, "required": ["a"]}
    if then_kind == "required":
        then = {"column": "b", "required": True}
        then_schema = {"required": ["b"]}
    elif then_kind == "pattern":
        then = {"column": "b", "pattern": "^a"}
        then_schema = {"properties": {"b": {"pattern": "^a"}}}
    else:
        then = {"column": "b", "equals": "abc"}
        then_schema = {"properties": {"b": {"const": "abc"}}, "required": ["b"]}
    rule = {"kind": "conditional", "when": when, "then": then}
    schema = {"type": "object", "if": if_schema, "then": then_schema}
    if with_else:
        rule["otherwise"] = {"column": "b", "pattern": "z$"}
        schema["else"] = {"properties": {"b": {"pattern": "z$"}}}
    m = manifest_from_dict({"id": "prop", "table": "t", "rules": [rule]})
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "id long, a string, b string"
    )
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    v = jsonschema.Draft7Validator(schema)
    expected = set()
    for i, (a, b) in enumerate(rows):
        inst = {}
        if a is not None:
            inst["a"] = a
        if b is not None:
            inst["b"] = b
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert got == expected


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.one_of(st.none(), st.lists(st.one_of(st.none(), st.integers(-30, 30)), max_size=5)),
        min_size=1,
        max_size=12,
    ),
    lo=st.integers(min_value=-10, max_value=10),
    kind=st.sampled_from(["range", "enum"]),
)
def test_contains_matches_jsonschema(spark, docs, lo, kind):
    """Draft-6 contains (existential element check) vs Draft7Validator —
    including the null-element subtlety: enum constrains a null instance
    (null is not a witness), range does not apply to nulls."""
    from schema_enforcer_spark.manifest import manifest_from_dict

    if kind == "range":
        rule = {"kind": "contains", "column": "v", "check": "range", "minimum": lo}
        body = {"contains": {"minimum": lo}}
    else:
        rule = {"kind": "contains", "column": "v", "check": "enum", "values": [lo, lo + 1]}
        body = {"contains": {"enum": [lo, lo + 1]}}
    m = manifest_from_dict({"id": "prop", "table": "t", "rules": [rule]})
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id long, v array<long>")
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    v = jsonschema.Draft7Validator({"type": "object", "properties": {"v": body}})
    expected = set()
    for i, d in enumerate(docs):
        inst = {} if d is None else {"v": d}
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert got == expected


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), _text),
            st.one_of(st.none(), _text),
            st.one_of(st.none(), _text),
        ),
        min_size=1,
        max_size=12,
    ),
)
def test_dependent_required_matches_jsonschema(spark, rows):
    """dependent_required vs Draft-7 `dependencies` (property-list form):
    presence of column a requires b and c."""
    from schema_enforcer_spark.manifest import manifest_from_dict

    m = manifest_from_dict(
        {
            "id": "prop",
            "table": "t",
            "rules": [{"kind": "dependent_required", "column": "a", "requires": ["b", "c"]}],
        }
    )
    df = spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(rows)], "id long, a string, b string, c string"
    )
    got = {
        int(r["absolute_path"][0])
        for r in ValidationEngine(m, key_columns=["id"]).violations(df).collect()
    }
    v = jsonschema.Draft7Validator({"type": "object", "dependencies": {"a": ["b", "c"]}})
    expected = set()
    for i, (a, b, c) in enumerate(rows):
        inst = {k: x for k, x in zip("abc", (a, b, c)) if x is not None}
        if any(True for _ in v.iter_errors(inst)):
            expected.add(i)
    assert got == expected


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(
    raw=st.recursive(
        st.one_of(st.none(), st.booleans(), st.integers(), st.floats(allow_nan=False), _text),
        lambda children: st.one_of(
            st.lists(children, max_size=4),
            st.dictionaries(
                st.sampled_from(
                    ["id", "table", "rules", "kind", "column", "columns", "values",
                     "pattern", "minimum", "checks", "include", "strict", "when", "then"]
                ),
                children,
                max_size=5,
            ),
        ),
        max_leaves=12,
    )
)
def test_manifest_loader_fuzz_never_crashes(raw):
    """manifest_from_dict on arbitrary junk either returns a Manifest or
    raises InvalidManifest — never an unhandled TypeError/KeyError (a
    malformed manifest must fail with line-addressable errors, reference
    InvalidJSONSchema parity). No Spark needed: this is the driver-side
    meta-validation path."""
    from schema_enforcer_spark.manifest import InvalidManifest, Manifest, manifest_from_dict

    try:
        m = manifest_from_dict(raw if isinstance(raw, dict) else {"id": "x", "table": "t", "rules": raw})
        assert isinstance(m, Manifest)
    except InvalidManifest:
        pass
