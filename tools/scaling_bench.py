"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

Runs the IDENTICAL transcripts-validation job at local[8] and local[32]
(each in its own JVM via subprocess — Spark can't change master in-session)
on the SAME pre-materialized input, reports throughput at both plus
scaling efficiency = (T8/T32) / (32/8), and writes BENCH/BASELINE.md.

local[8] vs local[32] is the sandbox proxy for N vs 4N executors: the job
is shuffle/partition-structured identically (fixed 64 shuffle partitions),
only the executor-thread count changes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_TEMPLATE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.manifest import load_manifest
from schema_enforcer_spark.synth import gen_transcripts

cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .appName(f"scaling-bench-{{cpus}}")
         .config("spark.sql.shuffle.partitions", "64")  # FIXED across runs: same plan, same partitioning
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "48g")
         .config("spark.local.dir", "/dev/shm/spark-local")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
path = {path!r}
if not os.path.exists(path):
    gen_transcripts(spark, n_convs={n_convs}, seed=42,
                    hot_convs=max({n_convs} // 1000, 1), hot_turns=2000
                    ).write.mode("overwrite").parquet(path)
tdf = spark.read.parquet(path)
n = tdf.count()
eng = ValidationEngine(load_manifest(os.path.join({repo!r}, "manifests", "transcripts_base.yml")))
# warm-up (JIT/codegen caches) on a slice, then the measured run
eng.validate(tdf.limit(10000)).violations.count()
t0 = time.monotonic()
rep = eng.validate(tdf)
rep.violations.write.format("noop").mode("overwrite").save()
rep.verdicts.write.format("noop").mode("overwrite").save()
el = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "turns": n, "sec": round(el, 3), "turns_per_sec": round(n / el, 1)}}))
spark.stop()
"""


def run_at(cpus: int, path: str, n_convs: int) -> dict:
    code = _RUN_TEMPLATE.format(repo=REPO, cpus=cpus, path=path, n_convs=n_convs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800, check=False
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from local[{cpus}] run:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    n_convs = int(os.environ.get("BENCH_TRANSCRIPT_CONVS", "200000"))
    path = f"/tmp/bench_transcripts_{n_convs}"
    low = run_at(8, path, n_convs)
    high = run_at(32, path, n_convs)
    speedup = low["sec"] / high["sec"]
    efficiency = speedup / (32 / 8)
    result = {"local8": low, "local32": high, "speedup": round(speedup, 3), "scaling_efficiency": round(efficiency, 3)}
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            f"""# BENCH/BASELINE — measured scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 between N and 4N
executors, evidenced in-sandbox by the identical job (same input parquet,
same plan, fixed 64 shuffle partitions) at local[8] vs local[32].

Job: full base-manifest validation (11 row rules + uniqueness + fused
ordering/contiguity windows + per-partition verdicts) over a generated
transcripts table with 0.1% hot conversations of 2000 turns (skew mix),
violations + verdicts fully materialized via the noop sink.

| config | turns | wall sec | turns/sec |
|---|---|---|---|
| local[8]  (N)  | {low['turns']:,} | {low['sec']} | {low['turns_per_sec']:,} |
| local[32] (4N) | {high['turns']:,} | {high['sec']} | {high['turns_per_sec']:,} |

- speedup 8->32 threads: **{speedup:.2f}x** (ideal 4x)
- scaling efficiency: **{efficiency:.3f}** (criterion: >= 0.8)

Reproduce: `python tools/scaling_bench.py` (BENCH_TRANSCRIPT_CONVS={n_convs}).
"""
        )
    print(f"wrote BENCH/BASELINE.md (efficiency={efficiency:.3f})")


if __name__ == "__main__":
    main()
