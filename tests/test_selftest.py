"""Golden-corpus self-test harness: generate-invalid round-trip + drift
detection, mirroring the reference's schema --check semantics."""

from __future__ import annotations

import json
import os

import pytest

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.selftest import generate_invalid, test_manifest as run_manifest_selftest
from schema_enforcer_spark.synth import gen_transcripts, inject


@pytest.fixture(scope="module")
def corpus(spark, base_manifest, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus") / base_manifest.id.replace("/", "_"))
    clean = gen_transcripts(spark, n_convs=15, seed=42)
    clean.write.parquet(os.path.join(root, "valid", "clean.parquet"))
    for case in ["invalid_enum", "missing_required", "dup_turn"]:
        inject(clean, case).write.parquet(os.path.join(root, "invalid", case, "data.parquet"))
    return root


def test_generate_then_check_roundtrip(spark, base_manifest, corpus):
    eng = ValidationEngine(base_manifest)
    written = generate_invalid(spark, eng, corpus)
    assert len(written) == 3
    with open(written[0], encoding="utf-8") as fh:
        rows = json.load(fh)
    assert rows and all({"schema_id", "message"} <= set(r) for r in rows)

    res = run_manifest_selftest(spark, eng, corpus)
    assert res.ok, res.failed
    assert len(res.passed) == 4  # 1 valid + 3 invalid


def test_selftest_detects_drift(spark, base_manifest, corpus):
    eng = ValidationEngine(base_manifest)
    generate_invalid(spark, eng, corpus)
    # corrupt one golden → harness must flag exactly that case
    golden = os.path.join(corpus, "invalid", "invalid_enum", "results.json")
    with open(golden, encoding="utf-8") as fh:
        rows = json.load(fh)
    rows[0]["message"] = "tampered"
    with open(golden, "w", encoding="utf-8") as fh:
        json.dump(rows, fh)
    res = run_manifest_selftest(spark, eng, corpus)
    assert [c for c, _ in res.failed] == ["invalid/invalid_enum"]
    # restore
    generate_invalid(spark, eng, corpus)


def test_yaml_golden_roundtrip(spark, base_manifest, corpus):
    """F4 parity: generate results.yml goldens (quoted-string style, like the
    reference's dump_data_to_yaml) and have the harness consume them."""
    eng = ValidationEngine(base_manifest)
    # clear the JSON goldens so the YAML ones are authoritative
    for case in ["invalid_enum", "missing_required", "dup_turn"]:
        p = os.path.join(corpus, "invalid", case, "results.json")
        if os.path.exists(p):
            os.remove(p)
    written = generate_invalid(spark, eng, corpus, fmt="yaml")
    assert all(w.endswith("results.yml") for w in written)
    # quoted-string style: every string scalar is double-quoted
    with open(written[0], encoding="utf-8") as fh:
        text = fh.read()
    assert 'schema_id: "' in text and 'message: "' in text
    res = run_manifest_selftest(spark, eng, corpus)
    assert res.ok, res.failed
    # restore JSON goldens for other tests (module-scoped fixture)
    generate_invalid(spark, eng, corpus)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="fmt"):
        generate_invalid(spark, eng, corpus, fmt="toml")


def test_manifest_extension_probe(tmp_path):
    """S4 parity: --manifest manifests/base resolves base.{yml,yaml,json}
    first-hit (find_file, utils.py:408-446)."""
    import pytest as _pytest
    from schema_enforcer_spark.manifest import find_manifest_file, load_manifest

    base = tmp_path / "base.yaml"
    base.write_text("id: schemas/probe\nrules:\n  - kind: required\n    column: x\n")
    assert find_manifest_file(str(tmp_path / "base")) == str(base)
    m = load_manifest(str(tmp_path / "base"))
    assert m.id == "schemas/probe"
    # yml wins over yaml (probe order)
    yml = tmp_path / "base.yml"
    yml.write_text("id: schemas/probe_yml\nrules:\n  - kind: required\n    column: x\n")
    assert load_manifest(str(tmp_path / "base")).id == "schemas/probe_yml"
    # exact path still wins outright
    assert find_manifest_file(str(base)) == str(base)
    with _pytest.raises(FileNotFoundError, match="probed"):
        find_manifest_file(str(tmp_path / "nope"))


def test_ensure_invalid_guard(spark, base_manifest, tmp_path):
    root = str(tmp_path / "corpus2")
    clean = gen_transcripts(spark, n_convs=5, seed=42)
    clean.write.parquet(os.path.join(root, "invalid", "actually_clean", "data.parquet"))
    with pytest.raises(ValueError, match="zero violations"):
        generate_invalid(spark, ValidationEngine(base_manifest), root)
