"""Manifest self-test harness — the distributed analogue of
``schema-enforcer schema --check`` and ``--generate-invalid``
(/root/reference/schema_enforcer/schemas/manager.py:128-287).

Corpus layout mirrors the reference's
``tests/<schema_id>/{valid,invalid/<case>/{data,results}}``
(manager.py:306-330), re-expressed at table grain:

    <corpus_root>/<manifest_name>/
        valid/<case>.parquet          # must produce ZERO violations
        invalid/<case>/data.parquet   # input
        invalid/<case>/results.json   # expected violation rows (golden)
        invalid/<case>/results.yml    # ...or the YAML variant (F4 parity:
                                      # quoted-string style like the
                                      # reference's dump_data_to_yaml,
                                      # utils.py:177-222 — reference corpora
                                      # port without conversion)

Comparison is order-insensitive after message-sort, exactly like
manager.py:235-236. ``generate_invalid`` writes the golden files from the
engine's current output, guarded by ensure-invalid (manager.py:332-347:
a case that produces zero violations or any PASS row is a corpus bug).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from schema_enforcer_spark.engine import ValidationEngine

# columns compared in goldens (instance_name depends on partition layout, so
# it is included; absolute_path serialized as list)
_GOLDEN_COLS = ["schema_id", "absolute_path", "failing_value", "message"]


@dataclass
class SelfTestResult:
    manifest_id: str
    passed: list[str] = field(default_factory=list)
    failed: list[tuple[str, str]] = field(default_factory=list)  # (case, reason)

    @property
    def ok(self) -> bool:
        return not self.failed


def _golden_rows(violations: DataFrame) -> list[dict]:
    rows = [
        {c: (list(r[c]) if c == "absolute_path" else r[c]) for c in _GOLDEN_COLS}
        for r in violations.select(*_GOLDEN_COLS).collect()
    ]
    # absolute_path is part of the key: two array elements failing with the
    # same value differ only by index, and a key tie would make golden order
    # depend on collect order (partition layout)
    return sorted(
        rows,
        key=lambda d: (d["message"] or "", d["schema_id"], d["failing_value"] or "", d["absolute_path"] or []),
    )


class _QuotedStr(str):
    """Marker for double-quoted YAML scalars — the reference wraps every
    string in DoubleQuotedScalarString before dumping
    (/root/reference/schema_enforcer/utils.py:58-99)."""


def _yaml_quote(obj):
    if isinstance(obj, str):
        return _QuotedStr(obj)
    if isinstance(obj, list):
        return [_yaml_quote(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _yaml_quote(v) for k, v in obj.items()}
    return obj


def dump_data_to_yaml(data, yaml_path: str) -> None:
    """Golden-results YAML writer with quoted-string style — the analogue of
    the reference's dump_data_to_yaml (utils.py:177-222)."""
    import yaml

    class _Dumper(yaml.SafeDumper):
        pass

    _Dumper.add_representer(
        _QuotedStr,
        lambda d, s: d.represent_scalar("tag:yaml.org,2002:str", s, style='"'),
    )
    with open(yaml_path, "w", encoding="utf-8") as fh:
        yaml.dump(_yaml_quote(data), fh, Dumper=_Dumper, default_flow_style=False, sort_keys=False)


def _load_golden(case_dir: str):
    """First-hit golden load: results.json, then results.yml/.yaml (the
    find_file probe order, utils.py:408-446). Returns (rows, path) or
    (None, None)."""
    import yaml

    for name in ("results.json", "results.yml", "results.yaml"):
        p = os.path.join(case_dir, name)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as fh:
                return (json.load(fh) if name.endswith(".json") else yaml.safe_load(fh)), p
    return None, None


def test_manifest(
    spark: SparkSession,
    engine: ValidationEngine,
    corpus_dir: str,
    ref_tables: dict[str, DataFrame] | None = None,
) -> SelfTestResult:
    """Run every valid/invalid case for one manifest; mirror of
    manager.test_schemas (manager.py:128-150)."""
    res = SelfTestResult(manifest_id=engine.manifest.id)
    valid_dir = os.path.join(corpus_dir, "valid")
    if os.path.isdir(valid_dir):
        for case in sorted(os.listdir(valid_dir)):
            if not case.endswith(".parquet"):
                continue
            df = spark.read.parquet(os.path.join(valid_dir, case))
            n = engine.violations(df, ref_tables).count()
            if n == 0:
                res.passed.append(f"valid/{case}")
            else:
                res.failed.append((f"valid/{case}", f"expected PASS, got {n} violation(s)"))
    invalid_dir = os.path.join(corpus_dir, "invalid")
    if os.path.isdir(invalid_dir):
        for case in sorted(os.listdir(invalid_dir)):
            case_dir = os.path.join(invalid_dir, case)
            data_path = os.path.join(case_dir, "data.parquet")
            if not os.path.isdir(data_path) and not os.path.exists(data_path):
                continue
            raw_expected, golden_path = _load_golden(case_dir)
            if raw_expected is None:
                res.failed.append((f"invalid/{case}", "missing results.json/.yml golden"))
                continue
            df = spark.read.parquet(data_path)
            actual = _golden_rows(engine.violations(df, ref_tables))
            expected = sorted(
                raw_expected,
                key=lambda d: (d["message"] or "", d["schema_id"], d["failing_value"] or ""),
            )
            if actual == expected:
                res.passed.append(f"invalid/{case}")
            else:
                res.failed.append(
                    (f"invalid/{case}", f"violation rows differ: actual={actual[:3]} expected={expected[:3]}")
                )
    return res


def generate_invalid(
    spark: SparkSession,
    engine: ValidationEngine,
    corpus_dir: str,
    ref_tables: dict[str, DataFrame] | None = None,
    fmt: str = "json",
) -> list[str]:
    """Write results.json (or results.yml with fmt='yaml': quoted-string
    style, F4) goldens for every invalid case — mirror of
    ``--generate-invalid`` (manager.py:258-287) with the ensure-invalid
    guard (manager.py:332-347)."""
    if fmt not in ("json", "yaml"):
        raise ValueError(f"fmt must be 'json' or 'yaml', got {fmt!r}")
    written = []
    invalid_dir = os.path.join(corpus_dir, "invalid")
    for case in sorted(os.listdir(invalid_dir)):
        case_dir = os.path.join(invalid_dir, case)
        data_path = os.path.join(case_dir, "data.parquet")
        if not (os.path.isdir(data_path) or os.path.exists(data_path)):
            continue
        df = spark.read.parquet(data_path)
        rows = _golden_rows(engine.violations(df, ref_tables))
        if not rows:
            raise ValueError(
                f"invalid case {case!r} produced zero violations — not a valid "
                "invalid-corpus entry (ensure-invalid guard)"
            )
        if fmt == "yaml":
            golden_path = os.path.join(case_dir, "results.yml")
            dump_data_to_yaml(rows, golden_path)
        else:
            golden_path = os.path.join(case_dir, "results.json")
            with open(golden_path, "w", encoding="utf-8") as fh:
                json.dump(rows, fh, indent=2, default=str)
        written.append(golden_path)
    return written
