"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys
from collections import Counter

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].startswith("/") else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not a.startswith("/"))

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"{name}: rows-only (no oracle) — {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            s, d = _rowset(scols, srows), _rowset(dcols, drows)
            if s != d:
                extra_s = list((s - d).items())[:3]
                extra_d = list((d - s).items())[:3]
                problems.append(f"values: only-spark={extra_s} only-duck={extra_d}")
        if problems:
            failures.append(name)
            print(f"{name}: MISMATCH — " + " | ".join(problems))
        else:
            print(f"{name}: MATCH ({len(srows)} rows)")
    print()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
