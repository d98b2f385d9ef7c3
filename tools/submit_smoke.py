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
import sys
from pyspark.sql import SparkSession
from schema_enforcer_spark import ValidationEngine, load_manifest
from schema_enforcer_spark.synth import gen_transcripts, inject

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
m = load_manifest(sys.argv[1])
report = ValidationEngine(m).validate(inject(gen_transcripts(spark, n_convs=10), "invalid_enum"))
n = report.violations.count()
print(f"SUBMIT_SMOKE violations={n} passes={report.passes()}")
assert n > 0 and not report.passes()
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
