"""schema_enforcer_spark — a PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the validation capabilities of
networktocode/schema-enforcer (reference at /root/reference, read-only),
re-expressed over Spark DataFrames:

- Declarative constraint manifests (YAML/JSON, ``$id``-keyed like the
  reference's schema files — /root/reference/schema_enforcer/schemas/jsonschema.py:18-34)
  compile to Catalyst ``Column`` predicates on the driver.
- A single-pass violation projection evaluates EVERY rule per row
  (mirrors ``Draft7Validator.iter_errors`` emitting all errors,
  /root/reference/schema_enforcer/schemas/jsonschema.py:64-70) — one scan,
  N rules, whole-stage codegen, no per-row Python.
- Per-partition PASS/FAIL verdicts + violation rows
  (/root/reference/schema_enforcer/validation.py:11-40 row model).
- Table-grain rules: uniqueness, referential integrity, ordering windows,
  declarative aggregate thresholds (the JMESPath-validator analogue,
  /root/reference/schema_enforcer/schemas/validator.py:65-88).
- Column stats + HLL sketches, KS/PSI distribution drift.
- Resumable per-partition checkpoint lineage.
"""

from schema_enforcer_spark.manifest import Manifest, Rule, load_manifest, manifest_from_dict
from schema_enforcer_spark.engine import ValidationEngine, ValidationReport, validate_many
from schema_enforcer_spark.binding import ManifestRegistry, ManifestNotDefined
from schema_enforcer_spark.checkpoint import CheckpointManager
from schema_enforcer_spark.evolution import compatible, diff_manifests
from schema_enforcer_spark.infer import infer_fds, infer_manifest, write_inferred_manifest

__version__ = "0.4.0"

__all__ = [
    "Manifest",
    "Rule",
    "load_manifest",
    "manifest_from_dict",
    "ValidationEngine",
    "ValidationReport",
    "validate_many",
    "ManifestRegistry",
    "ManifestNotDefined",
    "CheckpointManager",
    "compatible",
    "diff_manifests",
    "infer_fds",
    "infer_manifest",
    "write_inferred_manifest",
]
