"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

The comparison is deliberately REPRESENTATION-SENSITIVE, mirroring the
driver's pandas canonicalizer: both sides go through the same pandas
bridges the driver uses (Spark ``toPandas()``, DuckDB ``.df()``), every
cell is tagged with its Python type, and floats compare by exact bits
(``float.hex()``).  Round 1 proved why: DuckDB's ``.df()`` degrades any
DECIMAL or HUGEINT column to float64, so a Spark decimal/long column can
pass a value-level check and still hash-mismatch at the driver.  A list
valued column is flagged too — the driver sorts every column and pandas
cannot factorize lists (the round-1 q28 crash).

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
    """Type-tagged canonical cell value: two cells compare equal only if the
    pandas bridge delivered the same representation to both engines."""
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, np.bool_):
        v = bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f|nan"
        return f"f|{v.hex()}"
    if isinstance(v, bool):
        return f"b|{v}"
    if isinstance(v, int):
        return f"i|{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec|{v}"
    if isinstance(v, datetime.datetime):
        return f"ts|{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"bin|{bytes(v).hex()}"
    if isinstance(v, str):
        return f"s|{v}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "LIST[" + ",".join(_norm(x) for x in v) + "]"
    return f"{type(v).__name__}|{v}"


def _is_listy(v):
    return isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"


def _pdf_rowset(pdf):
    import pandas as pd  # noqa: F401

    cols = sorted(pdf.columns)
    listy = [c for c in cols if pdf[c].map(_is_listy).any()]
    rows = Counter(
        tuple(_norm(None if v is None or (isinstance(v, float) and math.isnan(v)) else v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return rows, listy


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
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        srows, s_listy = _pdf_rowset(spdf)
        if name not in oracles:
            tag = f" DRIVER-UNSAFE list columns {s_listy}" if s_listy else ""
            print(f"{name}: rows-only (no oracle) — {len(spdf)} rows, cols={list(spdf.columns)}{tag}")
            if s_listy:
                failures.append(name)
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            continue
        drows, _ = _pdf_rowset(dpdf)
        problems = []
        if s_listy:
            problems.append(f"DRIVER-UNSAFE list columns {s_listy}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(f"cols spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}")
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        if not problems and srows != drows:
            extra_s = list((srows - drows).items())[:2]
            extra_d = list((drows - srows).items())[:2]
            problems.append(f"values: only-spark={extra_s} only-duck={extra_d}")
        if problems:
            failures.append(name)
            print(f"{name}: MISMATCH — " + " | ".join(problems))
        else:
            print(f"{name}: MATCH ({len(spdf)} rows)")
    print()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
