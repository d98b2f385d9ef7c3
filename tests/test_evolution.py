"""Manifest-evolution diff: classification unit tests plus the semantic
contract — whenever the diff says 'compatible', every row valid under the
old manifest must stay valid under the new one."""

from __future__ import annotations

import pytest

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.evolution import Change, compatible, diff_manifests
from schema_enforcer_spark.manifest import manifest_from_dict


def _m(rules, mid="schemas/v"):
    return {"id": mid, "rules": rules}


def _effects(old, new):
    return {(c.change, c.kind, c.effect) for c in diff_manifests(old, new)}


def test_add_remove_rules():
    old = _m([{"kind": "required", "column": "a"}])
    new = _m(
        [{"kind": "required", "column": "a"}, {"kind": "not_empty", "column": "b"}]
    )
    assert _effects(old, new) == {("added", "not_empty", "tightened")}
    assert not compatible(old, new)
    assert _effects(new, old) == {("removed", "not_empty", "relaxed")}
    assert compatible(new, old)
    # identical manifests: no changes at all
    assert diff_manifests(old, old) == []
    assert compatible(old, old)


def test_enum_set_semantics():
    old = _m([{"kind": "enum", "column": "r", "values": ["a", "b"]}])
    grew = _m([{"kind": "enum", "column": "r", "values": ["a", "b", "c"]}])
    shrank = _m([{"kind": "enum", "column": "r", "values": ["a"]}])
    swapped = _m([{"kind": "enum", "column": "r", "values": ["a", "x"]}])
    assert _effects(old, grew) == {("modified", "enum", "relaxed")}
    assert compatible(old, grew)
    assert _effects(old, shrank) == {("modified", "enum", "tightened")}
    assert _effects(old, swapped) == {("modified", "enum", "changed")}
    assert not compatible(old, swapped)


def test_bound_semantics():
    old = _m([{"kind": "range", "column": "v", "minimum": 0, "maximum": 10}])
    widened = _m([{"kind": "range", "column": "v", "minimum": -5, "maximum": 20}])
    narrowed = _m([{"kind": "range", "column": "v", "minimum": 2, "maximum": 10}])
    mixed = _m([{"kind": "range", "column": "v", "minimum": 2, "maximum": 20}])
    dropped = _m([{"kind": "range", "column": "v", "maximum": 10}])
    assert _effects(old, widened) == {("modified", "range", "relaxed")}
    assert _effects(old, narrowed) == {("modified", "range", "tightened")}
    assert _effects(old, mixed) == {("modified", "range", "changed")}
    assert _effects(old, dropped) == {("modified", "range", "relaxed")}
    # exclusive bounds participate in the same comparison
    excl = _m([{"kind": "range", "column": "v", "exclusive_minimum": 0, "maximum": 10}])
    assert compatible(excl, widened)


def test_incomparable_kinds_and_identity():
    old = _m([{"kind": "pattern", "column": "p", "pattern": "^a+$"}])
    new = _m([{"kind": "pattern", "column": "p", "pattern": "^b+$"}])
    assert _effects(old, new) == {("modified", "pattern", "changed")}
    # same kind on a DIFFERENT column is add+remove, not a modification
    moved = _m([{"kind": "pattern", "column": "q", "pattern": "^a+$"}])
    assert _effects(old, moved) == {
        ("removed", "pattern", "relaxed"),
        ("added", "pattern", "tightened"),
    }
    # outlier fence: larger k relaxes
    o1 = _m([{"kind": "outlier", "column": "v", "k": 1.5}])
    o2 = _m([{"kind": "outlier", "column": "v", "k": 3.0}])
    assert _effects(o1, o2) == {("modified", "outlier", "relaxed")}
    assert _effects(o2, o1) == {("modified", "outlier", "tightened")}


def test_duplicate_keys_pair_off():
    two = _m(
        [
            {"kind": "pattern", "column": "p", "pattern": "^a"},
            {"kind": "pattern", "column": "p", "pattern": "b$"},
        ]
    )
    one = _m([{"kind": "pattern", "column": "p", "pattern": "^a"}])
    assert _effects(two, one) == {("removed", "pattern", "relaxed")}
    assert compatible(two, one)


def test_semantic_contract_on_data(spark):
    """The point of the diff: when it reports compatible, rows valid under
    the old manifest validate clean under the new one."""
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 9.5)], "id long, r string, v double"
    )
    old = _m(
        [
            {"kind": "enum", "column": "r", "values": ["a", "b"]},
            {"kind": "range", "column": "v", "minimum": 0, "maximum": 10},
            {"kind": "required", "column": "id"},
        ]
    )
    new = _m(
        [
            {"kind": "enum", "column": "r", "values": ["a", "b", "c"]},
            {"kind": "range", "column": "v", "minimum": -1, "maximum": 100},
        ]
    )
    assert compatible(old, new)
    eng_kw = dict(key_columns=["id"], instance_expr="'t'")
    assert ValidationEngine(manifest_from_dict(old), **eng_kw).validate(df).passes()
    assert ValidationEngine(manifest_from_dict(new), **eng_kw).validate(df).passes()
    # and the breaking direction really breaks: shrink the enum, data fails
    breaking = _m([{"kind": "enum", "column": "r", "values": ["a"]}])
    assert not compatible(old, breaking)
    assert not ValidationEngine(manifest_from_dict(breaking), **eng_kw).validate(df).passes()


def test_cli_diff(tmp_path, capsys):
    import yaml

    from schema_enforcer_spark.cli import main as cli_main

    old = {"id": "schemas/v1", "rules": [{"kind": "enum", "column": "r", "values": ["a"]}]}
    new = {"id": "schemas/v2", "rules": [{"kind": "enum", "column": "r", "values": ["a", "b"]}]}
    po, pn = tmp_path / "old.yml", tmp_path / "new.yml"
    po.write_text(yaml.safe_dump(old))
    pn.write_text(yaml.safe_dump(new))
    assert cli_main(["--diff-manifests", str(po), str(pn)]) == 0
    out = capsys.readouterr().out
    assert "RELAXED" in out and "backward-compatible" in out
    # reverse direction is breaking -> exit 1
    assert cli_main(["--diff-manifests", str(pn), str(po)]) == 1
    assert "NOT backward-compatible" in capsys.readouterr().out


def test_change_line_format():
    c = Change("modified", "range", "v", "tightened", "bounds [0, 10] -> [2, 10]")
    assert c.line() == "TIGHTENED modified range on v: bounds [0, 10] -> [2, 10]"


def test_inclusive_exclusive_switch_is_changed():
    inc = _m([{"kind": "range", "column": "v", "minimum": 0, "maximum": 10}])
    exc = _m([{"kind": "range", "column": "v", "exclusive_minimum": 0, "maximum": 10}])
    assert _effects(inc, exc) == {("modified", "range", "changed")}
    assert not compatible(inc, exc)


# --- property: the diff's verdict is sound against brute-force predicate
# implication (pure Python — no Spark; this tests the DIFF logic itself) ---

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

_GRID = list(range(-3, 14))  # covers every bound the strategies generate


def _pred(rule, v: int) -> bool:
    """Evaluate one rule against an integer value, mirroring engine
    semantics for the comparable kinds (NULL-free domain; both flavors of
    a bound conjoin, exactly as the engine compiles them)."""
    k = rule["kind"]
    if k == "enum":
        return v in rule["values"]
    if k == "range":
        ok = True
        if rule.get("minimum") is not None:
            ok = ok and v >= rule["minimum"]
        if rule.get("exclusive_minimum") is not None:
            ok = ok and v > rule["exclusive_minimum"]
        if rule.get("maximum") is not None:
            ok = ok and v <= rule["maximum"]
        if rule.get("exclusive_maximum") is not None:
            ok = ok and v < rule["exclusive_maximum"]
        return ok
    raise AssertionError(k)


def _rule_strategy():
    enum = st.builds(
        lambda vals: {"kind": "enum", "column": "c", "values": sorted(vals)},
        st.sets(st.integers(0, 9), min_size=1, max_size=5),
    )

    def _mk_range(lo, hi, use_lo, use_hi, xlo, xhi, both_lo, both_hi, lo2, hi2):
        r = {"kind": "range", "column": "c"}
        if use_lo:
            r["exclusive_minimum" if xlo else "minimum"] = min(lo, hi)
            if both_lo:  # degenerate composite bound — must read incomparable
                r["minimum" if xlo else "exclusive_minimum"] = lo2
        if use_hi:
            r["exclusive_maximum" if xhi else "maximum"] = max(lo, hi)
            if both_hi:
                r["maximum" if xhi else "exclusive_maximum"] = hi2
        if not use_lo and not use_hi:
            r["minimum"] = min(lo, hi)  # range needs >= 1 bound
        return r

    rng = st.builds(
        _mk_range,
        st.integers(-2, 12), st.integers(-2, 12),
        st.booleans(), st.booleans(), st.booleans(), st.booleans(),
        st.booleans(), st.booleans(), st.integers(-2, 12), st.integers(-2, 12),
    )
    return st.one_of(enum, rng)


if _HAVE_HYP:

    @settings(max_examples=300, deadline=None)
    @given(old_rule=_rule_strategy(), new_rule=_rule_strategy())
    def test_diff_verdict_sound_vs_brute_force(old_rule, new_rule):
        old, new = _m([old_rule]), _m([new_rule])
        changes = diff_manifests(old, new)
        valid_old = [v for v in _GRID if _pred(old_rule, v)]
        regressions = [v for v in valid_old if not _pred(new_rule, v)]
        if compatible(old, new):
            # SOUNDNESS (the contract the CLI exit code gates on): a
            # compatible verdict means no previously-valid value breaks
            assert not regressions, (old_rule, new_rule, regressions)
        if changes and all(c.effect == "tightened" for c in changes):
            # a pure tightening verdict must never be claimed when the new
            # rule actually accepts MORE of the domain (relaxation evidence)
            newly_ok = [
                v for v in _GRID if not _pred(old_rule, v) and _pred(new_rule, v)
            ]
            # same-kind modification only: add/remove pairs legitimately
            # admit new values (different columns)
            if all(c.change == "modified" for c in changes):
                assert not newly_ok, (old_rule, new_rule, newly_ok)


def test_multiple_of_divisibility():
    m4 = _m([{"kind": "multiple_of", "column": "v", "multiple_of": 4}])
    m2 = _m([{"kind": "multiple_of", "column": "v", "multiple_of": 2}])
    m3 = _m([{"kind": "multiple_of", "column": "v", "multiple_of": 3}])
    assert _effects(m4, m2) == {("modified", "multiple_of", "relaxed")}
    assert compatible(m4, m2)
    assert _effects(m2, m4) == {("modified", "multiple_of", "tightened")}
    assert _effects(m4, m3) == {("modified", "multiple_of", "changed")}


def test_physical_params_are_not_contract_changes():
    # toggling the message-only repair hint or a join/estimator strategy
    # must not read as a breaking change
    e1 = _m([{"kind": "enum", "column": "r", "values": ["a"]}])
    e2 = _m([{"kind": "enum", "column": "r", "values": ["a"], "suggest": True}])
    assert diff_manifests(e1, e2) == []
    o1 = _m([{"kind": "outlier", "column": "v", "k": 1.5, "exact": True}])
    o2 = _m([{"kind": "outlier", "column": "v", "k": 1.5}])
    assert compatible(o1, o2) and compatible(o2, o1)
    # normalize_keys stays semantic: it changes which rows match
    r1 = _m([{"kind": "referential", "columns": ["h"], "ref_table": "t", "ref_columns": ["x"]}])
    r2 = _m([{"kind": "referential", "columns": ["h"], "ref_table": "t",
              "ref_columns": ["x"], "normalize_keys": True}])
    assert diff_manifests(r1, r2) != []


def test_composite_bound_is_incomparable():
    """A rule with BOTH minimum and exclusive_minimum has a composite
    effective bound: {min 3, xmin 1} means v>=3, and judging from
    `minimum` alone would call {min 2, xmin 4} (v>4) a relaxation — an
    unsound approval. Such degenerate rules must read as incomparable."""
    both = _m([{"kind": "range", "column": "v", "minimum": 3, "exclusive_minimum": 1}])
    trap = _m([{"kind": "range", "column": "v", "minimum": 2, "exclusive_minimum": 4}])
    assert _effects(both, trap) == {("modified", "range", "changed")}
    assert not compatible(both, trap)
    single = _m([{"kind": "range", "column": "v", "minimum": 2}])
    assert _effects(both, single) == {("modified", "range", "changed")}


def test_nonbound_strength_change_not_masked_by_bound_movement():
    """ADVICE r6: for bound-pair kinds, a non-bound strength parameter
    change (rate_limit window_seconds) must read as CHANGED even when the
    bounds ALSO moved in a rankable direction — the old guard only fired
    when bounds were unchanged, so 60s/10 -> 86400s/20 reported RELAXED
    and compatible() approved a breaking upgrade."""
    old = _m([{"kind": "rate_limit", "partition_by": ["u"], "order_by": ["t"],
               "window_seconds": 60, "max_count": 10}])
    new = _m([{"kind": "rate_limit", "partition_by": ["u"], "order_by": ["t"],
               "window_seconds": 86400, "max_count": 20}])
    assert _effects(old, new) == {("modified", "rate_limit", "changed")}
    assert not compatible(old, new)
    # bound-only movement still ranks normally
    relax = _m([{"kind": "rate_limit", "partition_by": ["u"], "order_by": ["t"],
                 "window_seconds": 60, "max_count": 20}])
    assert _effects(old, relax) == {("modified", "rate_limit", "relaxed")}
    assert compatible(old, relax)
