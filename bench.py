"""Benchmark harness — one JSON line to stdout.

Measures:
1. Headline queries from __spark_entry__.queries() at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1), each fully materialized via the noop
   writer (no driver collect in the hot path).
2. The north-star metric: validated turns/sec — full base-manifest
   validation (row rules + uniqueness + ordering + contiguity + verdicts)
   over a generated transcripts table (~1.9M turns incl. hot-conversation
   skew), violations + verdicts materialized.

Timing methodology (this microVM's CPU is noisy/oversubscribed — CLAUDE.md
documents ~1.6x steal variance): every measurement is INTERLEAVED
best-of-K (default K=3, env BENCH_BEST_OF) — round-robin across all
queries per round, min per query — the same footing BENCH/BASELINE.md
uses, so per-query numbers are comparable across rounds instead of
reflecting whichever noise spike hit that slot.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
BENCH_TRANSCRIPT_CONVS (default 200_000), BENCH_SKIP_QUERIES=1,
BENCH_BEST_OF (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BENCH_TRANSCRIPT_CONVS", "200000"))
BEST_OF = int(os.environ.get("BENCH_BEST_OF", "3"))
# tmpfs-resident: scan bandwidth on a real cluster scales with executors, so
# measuring against the sandbox's slow virtual disk would misattribute
TRANSCRIPTS_PATH = os.environ.get("BENCH_TRANSCRIPTS_PATH", f"/dev/shm/bench_transcripts_{N_CONVS}")



def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from schema_enforcer_spark.engine import ValidationEngine
    from schema_enforcer_spark.manifest import load_manifest
    from schema_enforcer_spark.synth import gen_transcripts

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"schema-enforcer-spark-bench-{CPUS}")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- transcripts table (north-star metric input) ------------------------
    if not os.path.exists(TRANSCRIPTS_PATH):
        # materialize once so generation cost never pollutes the measurement;
        # 1% hot conversations with 2000 turns = the skew mix
        gen_transcripts(
            spark, n_convs=N_CONVS, seed=42, hot_convs=max(N_CONVS // 1000, 1), hot_turns=2000
        ).write.mode("overwrite").parquet(TRANSCRIPTS_PATH)
    tdf = spark.read.parquet(TRANSCRIPTS_PATH)
    n_turns = tdf.count()
    manifest = load_manifest(os.path.join(REPO, "manifests", "transcripts_base.yml"))
    eng = ValidationEngine(manifest)

    # reference-transcripts copy for the north-star per-turn text-equality
    # diff (BASELINE.json input_hint): deterministically tampered — ~1/1000
    # turns' text changed, ~1/2000 turns dropped — materialized once
    REF_PATH = TRANSCRIPTS_PATH + "_ref"
    if not os.path.exists(REF_PATH):
        from pyspark.sql import functions as F

        (
            tdf.withColumn(
                "text",
                F.when(
                    F.pmod(F.hash("conv_id", "turn_idx"), F.lit(1000)) == 7,
                    F.concat(F.lit("TAMPERED "), F.col("text")),
                ).otherwise(F.col("text")),
            )
            .filter(F.pmod(F.hash("conv_id", "turn_idx"), F.lit(2000)) != 13)
            .write.mode("overwrite")
            .parquet(REF_PATH)
        )
    ref_tdf = spark.read.parquet(REF_PATH)
    from schema_enforcer_spark.engine import validate_many
    from schema_enforcer_spark.manifest import manifest_from_dict

    eq_manifest = manifest_from_dict(
        {
            "id": "schemas/transcripts_equals_ref",
            "table": "transcripts",
            "rules": [
                {
                    "kind": "equals_table",
                    "columns": ["conv_id", "turn_idx"],
                    "ref_table": "reference",
                    "compare": ["text"],
                }
            ],
        }
    )
    eq_eng = ValidationEngine(eq_manifest)
    quality = load_manifest(os.path.join(REPO, "manifests", "transcripts_quality.yml"))
    engines_2m = [eng, ValidationEngine(quality)]

    def _run_validate() -> float:
        t0 = time.monotonic()
        report = eng.validate(tdf)
        _noop(report.violations)
        _noop(report.verdicts)
        dt = time.monotonic() - t0
        report.unpersist()
        return dt

    def _run_validate_2m() -> float:
        # multi-manifest fused path: base + quality manifests, all row rules
        # in ONE scan (engine.validate_many) — the per-engine path would be
        # ~2x the row-rule cost
        t0 = time.monotonic()
        report = validate_many(engines_2m, tdf)
        _noop(report.violations)
        _noop(report.verdicts)
        dt = time.monotonic() - t0
        report.unpersist()
        return dt

    def _run_equals_ref() -> float:
        # north-star grain: per-turn text equality vs the reference copy
        # under (conv_id, turn_idx) keys — one full-outer equi-join
        t0 = time.monotonic()
        _noop(eq_eng.violations(tdf, ref_tables={"reference": ref_tdf}))
        return time.monotonic() - t0

    # -- interleaved best-of-K over (validate + headline queries) -----------
    qs = entry.queries()
    fixed = {
        "validate_transcripts": _run_validate,
        "validate_transcripts_2manifests": _run_validate_2m,
        "equals_ref_transcripts": _run_equals_ref,
    }
    names = list(fixed)
    if os.environ.get("BENCH_SKIP_QUERIES") != "1":
        # every queries() entry, always — a hand-maintained list silently
        # drops newly added queries from the recorded bench
        names += sorted(qs)
    best: dict[str, float] = {}
    for _ in range(BEST_OF):
        for name in names:
            if name in fixed:
                dt = fixed[name]()
            else:
                t0 = time.monotonic()
                _noop(qs[name](spark, SF_DIR))
                dt = time.monotonic() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
    timings = {name: round(best[name], 3) for name in names}
    turns_per_sec = n_turns / best["validate_transcripts"]

    total = round(sum(timings.values()), 3)
    headline = {
        "metric": "validated turns/sec (base manifest incl. row rules + uniqueness + ordering + contiguity + verdicts)",
        "value": total,
        "unit": "sec",
        "sf": SF_DIR,
        "turns": n_turns,
        "turns_per_sec": round(turns_per_sec, 1),
        "cpus": CPUS,
        "best_of": BEST_OF,
        "n_queries": len(timings),
        "queries_file": "BENCH/last_bench.json",
    }
    # Output contract (round-6 fix for BENCH_r05.json parsed:null): the
    # driver's stdout capture is a bounded tail window, and one giant JSON
    # line with 60 per-query timings overflowed it, truncating the line's
    # HEAD (metric/value) and making the record unparseable. So: the short
    # headline (~300 bytes) is printed on its own line FIRST and repeated
    # LAST — whichever end of the capture window survives, a complete JSON
    # line with the headline fields parses. The full per-query map goes on
    # its own middle line (compact separators) and, authoritatively, to
    # BENCH/last_bench.json.
    head_line = json.dumps(headline, separators=(",", ":"))
    print(head_line)
    print(json.dumps({"queries": timings}, separators=(",", ":")))
    full = dict(headline, queries=timings)
    del full["queries_file"]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "last_bench.json"), "w") as fh:
        json.dump(full, fh, indent=1)
    print(head_line)
    spark.stop()


if __name__ == "__main__":
    main()
