"""Per-query isolation bench + plan dumper (guide §1.4/§1.5) — bench.py is
FROZEN for driver measurement; all round-7 iteration numbers come from here.

Usage:
  python bench_extra.py [--sf DIR] [--k K] [--plans plans/r07 --suffix before] [q16_... ...]

Times each named query (default: all) with the same methodology as bench.py
(noop sink, interleaved best-of-K, identical session config) and optionally
writes .explain("formatted") for each to <plans>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--plans", default=None, help="directory to write formatted plans to")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true", help="only dump plans")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName(f"schema-enforcer-spark-bench-extra-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(2 * args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    names = args.names or sorted(qs)
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query {n}; have {sorted(qs)}")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for n in names:
            df = qs[n](spark, args.sf)
            with open(os.path.join(args.plans, f"{n}_{args.suffix}.txt"), "w") as fh:
                fh.write(_formatted(df))
            print(f"plan written: {n}", file=sys.stderr)

    if not args.no_time:
        best: dict[str, float] = {}
        for _ in range(args.k):
            for n in names:
                spark.sparkContext.setJobDescription(n)
                t0 = time.monotonic()
                qs[n](spark, args.sf).write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                spark.sparkContext.setJobDescription(None)
                if n not in best or dt < best[n]:
                    best[n] = dt
        out = {n: round(best[n], 3) for n in names}
        out["_total"] = round(sum(best.values()), 3)
        print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
