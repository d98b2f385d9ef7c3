"""manifests/RULES.md is the user-facing rule reference — every YAML
snippet in it must parse and pass the same meta-validation a real
manifest does (doc-rot guard). Rules containing '...' placeholders are
illustrative elisions and are skipped."""

from __future__ import annotations

import os
import re

import yaml

from schema_enforcer_spark.manifest import RULE_KINDS, validate_manifest_dict

DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "manifests", "RULES.md"
)


def _doc_rules():
    text = open(DOC).read()
    for block in re.findall(r"```yaml\n(.*?)```", text, re.S):
        rules = yaml.safe_load(block)
        assert isinstance(rules, list), f"block is not a rule list:\n{block[:200]}"
        for rule in rules:
            yield rule


def _has_placeholder(obj) -> bool:
    if isinstance(obj, str):
        return "..." in obj
    if isinstance(obj, dict):
        return any(_has_placeholder(v) or _has_placeholder(k) for k, v in obj.items())
    if isinstance(obj, list):
        return any(_has_placeholder(v) for v in obj)
    return False


def test_every_documented_rule_meta_validates():
    n_checked = 0
    for rule in _doc_rules():
        assert isinstance(rule, dict) and "kind" in rule, rule
        assert rule["kind"] in RULE_KINDS, rule["kind"]
        if _has_placeholder(rule):
            continue
        errors = validate_manifest_dict({"id": "schemas/doc", "rules": [rule]})
        assert not errors, (rule, errors)
        n_checked += 1
    assert n_checked >= 30, f"only {n_checked} complete doc rules checked"


def test_doc_covers_every_rule_kind():
    documented = {r["kind"] for r in _doc_rules()}
    missing = RULE_KINDS - documented
    assert not missing, f"rule kinds absent from manifests/RULES.md: {sorted(missing)}"
