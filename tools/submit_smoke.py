"""spark-submit --py-files packaging smoke (north-rule packaging clause).

Zips the package, then spark-submits a driver script that imports
schema_enforcer_spark FROM THE ZIP (cwd is a scratch dir so the repo isn't
importable), validates a generated table, and prints a verdict line. Run:

    python tools/submit_smoke.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import os
import sys
import tempfile
from pyspark.sql import SparkSession
from schema_enforcer_spark import ValidationEngine, load_manifest
from schema_enforcer_spark.cli import main as cli_main
from schema_enforcer_spark.synth import gen_transcripts, inject

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
m = load_manifest(sys.argv[1])
report = ValidationEngine(m).validate(inject(gen_transcripts(spark, n_convs=10), "invalid_enum"))
n = report.violations.count()
assert n > 0 and not report.passes()
report.unpersist()

# the round-5 CLI surface must be spark-submit-proven, not just
# local-session-proven: exercise --quarantine, --sample-fraction and
# --stats-columns (incremental stats need --checkpoint) through the
# zip-imported cli entry point
work = tempfile.mkdtemp()
inp = os.path.join(work, "input")
inject(gen_transcripts(spark, n_convs=10), "invalid_enum").write.parquet(inp)
rc_q = cli_main(["--manifest", sys.argv[1], "--input", inp,
                 "--quarantine", os.path.join(work, "quarantine")])
assert rc_q == 1, f"--quarantine rc={rc_q}"
nq = spark.read.parquet(os.path.join(work, "quarantine")).filter("row_valid = false").count()
assert nq > 0, "quarantine wrote no violating rows"
rc_s = cli_main(["--manifest", sys.argv[1], "--input", inp, "--sample-fraction", "0.5"])
assert rc_s in (0, 1), f"--sample-fraction rc={rc_s}"
rc_st = cli_main(["--manifest", sys.argv[1], "--input", inp,
                  "--checkpoint", os.path.join(work, "ck"),
                  "--stats-columns", "turn_idx,role"])
assert rc_st == 1, f"--stats-columns rc={rc_st}"

# round-6 surface: manifest inference (with FD discovery) + evolution diff
draft_path = os.path.join(work, "draft.yml")
rc_i = cli_main(["--infer-manifest", draft_path, "--infer-id", "schemas/smoke_draft",
                 "--input", inp, "--infer-fds"])
assert rc_i == 0, f"--infer-manifest rc={rc_i}"
assert os.path.exists(draft_path), "inference wrote no draft"
# the drafted manifest encodes constraints the data satisfies, so diffing
# it against itself is compatible (0) and against the hand manifest is a
# real report with a deterministic exit code
rc_d0 = cli_main(["--diff-manifests", draft_path, draft_path])
assert rc_d0 == 0, f"--diff-manifests self rc={rc_d0}"
rc_d1 = cli_main(["--diff-manifests", draft_path, sys.argv[1]])
assert rc_d1 in (0, 1), f"--diff-manifests rc={rc_d1}"
print(f"SUBMIT_SMOKE violations={n} passes={report.passes()} quarantined={nq} cli_flags=ok")
spark.stop()
"""


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "schema_enforcer_spark.zip")
    pkg = os.path.join(REPO, "schema_enforcer_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def main() -> int:
    spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        print("spark-submit not on PATH", file=sys.stderr)
        return 2
    with tempfile.TemporaryDirectory() as tmp:
        zpath = build_zip(tmp)
        driver = os.path.join(tmp, "driver.py")
        with open(driver, "w") as fh:
            fh.write(DRIVER)
        manifest = os.path.join(REPO, "manifests", "transcripts_base.yml")
        proc = subprocess.run(
            [
                spark_submit,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zpath,
                driver, manifest,
            ],
            cwd=tmp,  # repo NOT importable from here — the zip must provide the package
            capture_output=True,
            text=True,
            timeout=600,
        )
        marker = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_SMOKE")]
        print("\n".join(marker) if marker else proc.stdout[-2000:] + proc.stderr[-2000:])
        if proc.returncode != 0 or not marker:
            return 1
    print("spark-submit --py-files smoke OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
