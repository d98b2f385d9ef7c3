"""Column statistics + distribution-drift checks (SURVEY.md §2.4 A7/A8).

Greenfield operators mandated by the north star (no reference counterpart —
the reference validates one document at a time and has no stats layer):

- ``column_stats``: min/max/null-rate/approx-distinct per column, ONE
  aggregation pass over the table (all columns' aggregates in a single
  ``agg()`` ⇒ one scan + one reduce).
- ``hll_sketches``: mergeable HyperLogLog sketches per column via Spark's
  built-in ``hll_sketch_agg`` — persisted per partition so later runs merge
  with ``hll_union_agg`` instead of rescanning.
- ``compute_histogram`` / ``ks_statistic`` / ``psi``: fixed-edge histograms
  via ``width_bucket`` + groupBy (distributed), drift math on the tiny
  histogram itself (driver or single-stage — never on raw rows).
- ``drift_violations``: manifest rule adapter — KS/PSI of the current table
  vs a stored baseline histogram on e.g. ``length(text)`` (turn length) or
  ts-gaps, emitting violation rows compatible with the engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: min/max/null_rate/approx_distinct — single scan."""
    columns = columns or df.columns
    aggs = []
    for c in columns:
        aggs += [
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            F.avg(F.col(c).isNull().cast("double")).alias(f"{c}__null_rate"),
            F.approx_count_distinct(c).alias(f"{c}__distinct"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single wide row into (column, min, max, null_rate, distinct)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.round(F.col(f"{c}__null_rate"), 6).alias("null_rate"),
                F.col(f"{c}__distinct").alias("approx_distinct"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")


def exact_column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Like column_stats but exact COUNT(DISTINCT) — used where a SQL oracle
    must reproduce the numbers bit-for-bit.

    Plan shape (r7): one single-column aggregation subtree PER column,
    unioned — not one wide agg with N count_distincts. The wide form plans
    as Expand x (N+1): every input row is duplicated once per distinct
    group before partial aggregation (2.3M events -> 14M expanded rows for
    5 columns). Per-column subtrees dedup single-column rows instead
    (Expand x2 at most), each scan is column-pruned to its own column so
    total bytes read stay ~one full scan, and the N independent stages run
    concurrently inside the one job. Values are identical (same min/max/
    null_rate/count_distinct expressions); row order across the union is
    arbitrary, as any multiset consumer must already assume. Measured
    1.44 -> 1.18 s on 1M-row events x5 columns (best-of-4 interleaved)."""
    columns = columns or df.columns
    parts = []
    for c in columns:
        # min/max on the NATIVE type (numeric order), cast to string after —
        # string-cast-then-min would compare lexicographically ("99" > "149")
        parts.append(
            df.select(F.col(c))
            .agg(
                F.min(F.col(c)).cast("string").alias("min"),
                F.max(F.col(c)).cast("string").alias("max"),
                F.round(F.avg(F.col(c).isNull().cast("double")), 6).alias("null_rate"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
            )
            .select(F.lit(c).alias("column"), "min", "max", "null_rate", "n_distinct")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hll_sketches(df: DataFrame, columns: list[str], group_by: str | None = "partition_id") -> DataFrame:
    """Per-partition HLL sketches (binary, mergeable with hll_union_agg) —
    the persistence format for incremental distinct counting at 10^12 rows."""
    aggs = [F.hll_sketch_agg(F.col(c).cast("string")).alias(f"{c}__hll") for c in columns]
    if group_by and group_by in df.columns:
        return df.groupBy(group_by).agg(*aggs)
    return df.agg(*aggs)


def merge_hll_estimate(sketches: DataFrame, columns: list[str]) -> DataFrame:
    """Merge per-partition sketches → one distinct estimate per column."""
    merged = sketches.agg(*[F.hll_union_agg(F.col(f"{c}__hll")).alias(f"{c}__hll") for c in columns])
    return merged.select(*[F.hll_sketch_estimate(f"{c}__hll").alias(f"{c}__distinct") for c in columns])


# ---------------------------------------------------------------------------
# Incremental per-partition column stats (checkpoint-resident)
# ---------------------------------------------------------------------------
#
# The north-star resumability contract is "per-partition lineage + stats":
# a resumed run must produce TABLE-level stats without rescanning the
# partitions it skipped. Persistence format: one long-format row per
# (partition_id, col_name) holding a mergeable HLL sketch (binary) plus
# null/row counts and min/max (string form for display + double form for
# numerically-correct merging — lexicographic string min would rank "10"
# below "9"). The store lives under the checkpoint dir with an underscore
# prefix, so lineage reads rooted at the checkpoint path skip it (same
# hidden-path convention as _drift_baselines.json), while explicit reads
# of the store path itself work normally.


def stats_store_path(checkpoint_dir: str) -> str:
    return checkpoint_dir.rstrip("/") + "/_column_stats"


def write_partition_stats(
    df: DataFrame,
    columns: list[str],
    store_path: str,
    instance_col,
    run_ns: int | None = None,
) -> None:
    """Append this run's per-partition stats rows. ``df`` should be the
    PENDING subset of a checkpointed run — the already-validated
    partitions' rows are in the store from earlier runs; not rescanning
    them is the point. One groupBy(partition) pass computes every column's
    sketch + counts (map-side combine; sketches are ~KB each so the
    shuffle is #partitions × #columns × KB regardless of table size)."""
    import time

    run_ns = run_ns if run_ns is not None else time.time_ns()
    aggs = []
    for c in columns:
        aggs += [
            F.hll_sketch_agg(F.col(c).cast("string")).alias(f"{c}__hll"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min_s"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max_s"),
            F.min(F.col(c).try_cast("double")).alias(f"{c}__min_n"),
            F.max(F.col(c).try_cast("double")).alias(f"{c}__max_n"),
        ]
    wide = df.groupBy(instance_col.alias("partition_id")).agg(
        F.count(F.lit(1)).alias("__n"), *aggs
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__hll").alias("hll"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__min_s").alias("min_s"),
                F.col(f"{c}__max_s").alias("max_s"),
                F.col(f"{c}__min_n").alias("min_n"),
                F.col(f"{c}__max_n").alias("max_n"),
            )
            for c in columns
        ]
    )
    long_rows = (
        wide.select("partition_id", F.col("__n").alias("n_rows"), F.explode(structs).alias("s"))
        .select(
            "partition_id",
            F.col("s.col_name").alias("col_name"),
            F.col("s.hll").alias("hll"),
            F.col("s.n_nulls").alias("n_nulls"),
            F.col("n_rows"),
            F.col("s.min_s").alias("min_s"),
            F.col("s.max_s").alias("max_s"),
            F.col("s.min_n").alias("min_n"),
            F.col("s.max_n").alias("max_n"),
            F.lit(run_ns).cast("bigint").alias("run_ns"),
        )
    )
    long_rows.write.mode("append").parquet(store_path)


def merged_column_stats(spark, store_path: str) -> DataFrame:
    """Table-level stats from the store alone — no data rescans. A FAILed
    partition re-validates on resume and re-appends its rows, so take the
    LATEST row per (partition_id, col_name) before merging: hll_union_agg
    for distincts, sums for null/row counts, min/max over the per-partition
    extremes (double form preferred, string form as display fallback)."""
    from pyspark.sql.window import Window

    st_df = spark.read.parquet(store_path)
    w = Window.partitionBy("partition_id", "col_name").orderBy(F.col("run_ns").desc())
    latest = st_df.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1).drop("_rk")
    return (
        latest.groupBy("col_name")
        .agg(
            F.coalesce(
                F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))), F.lit(0)
            ).alias("approx_distinct"),
            F.sum("n_nulls").alias("n_nulls"),
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_partitions"),
            F.min("min_n").alias("min_numeric"),
            F.max("max_n").alias("max_numeric"),
            F.min("min_s").alias("min_display"),
            F.max("max_s").alias("max_display"),
        )
    )


def hll_accuracy_report(df: DataFrame, columns: list[str], rel_tol: float = 0.02) -> DataFrame:
    """Per column: exact distinct count + a boolean asserting the HLL sketch
    estimate lands within ``rel_tol`` of it — ONE aggregation pass computing
    both. This is the oracle-replicable form of the sketch check: the raw
    estimate is engine-specific (Spark's sketch bits ≠ any other engine's),
    but (n_exact, within_tolerance) is deterministic, so a SQL oracle can
    reproduce rows/schema/hash while the sketch still runs for real.
    Default rel_tol matches Spark's lgConfigK=12 standard error (~1.6%).
    """
    aggs = []
    for c in columns:
        aggs += [
            F.count_distinct(F.col(c)).alias(f"{c}__exact"),
            F.hll_sketch_estimate(F.hll_sketch_agg(F.col(c).cast("string"))).alias(f"{c}__hll"),
        ]
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__exact").cast("bigint").alias("n_exact"),
                (
                    F.abs(F.col(f"{c}__hll") - F.col(f"{c}__exact"))
                    / F.col(f"{c}__exact")
                    <= F.lit(rel_tol)
                ).alias("within_tolerance"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")


def quantile_accuracy_report(
    df: DataFrame,
    column: str,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    accuracy: int = 10000,
    slack: float = 0.005,
) -> DataFrame:
    """Oracle-replicable accuracy check for ``approx_percentile``: per
    requested quantile p, emit (p, n_total, within_tolerance) where
    within_tolerance asserts the estimate's RANK interval contains a point
    within eps = 1/accuracy (+ slack) of p — the actual guarantee
    approx_percentile makes (rank error, not value error). Duplicates make
    a single value own a rank *interval* [count(<v), count(<=v)], so the
    check is interval containment, not a point comparison:

        count(x < est)/n <= p + eps   AND   count(x <= est)/n >= p - eps

    Like hll_accuracy_report, the raw estimates are engine-specific but the
    boolean + count are deterministic, so a SQL oracle reproduces
    rows/schema/hash while the sketch runs for real. Two distributed passes
    (one agg for the estimates, one for the rank counts via a broadcast of
    the single estimate row); nothing driver-side.
    """
    eps = 1.0 / accuracy + slack
    est = df.agg(
        F.percentile_approx(column, list(ps), accuracy).alias("_est"),
        F.count(column).alias("_n"),
    )
    joined = df.join(F.broadcast(est))
    rank_aggs = []
    for i in range(len(ps)):
        e = F.col("_est")[i]
        rank_aggs += [
            F.sum((F.col(column) < e).cast("long")).alias(f"_lt_{i}"),
            F.sum((F.col(column) <= e).cast("long")).alias(f"_le_{i}"),
        ]
    wide = joined.groupBy("_n").agg(*rank_aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("p"),
                F.col("_n").cast("bigint").alias("n_total"),
                (
                    (F.col(f"_lt_{i}") / F.col("_n") <= F.lit(p + eps))
                    & (F.col(f"_le_{i}") / F.col("_n") >= F.lit(p - eps))
                ).alias("within_tolerance"),
            )
            for i, p in enumerate(ps)
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")


def numeric_profile(df: DataFrame, columns: list[str], percentiles: list[float] | None = None) -> DataFrame:
    """Approximate percentile profile per numeric column — one pass via
    approx_percentile (t-digest-backed, mergeable across partitions).
    Complements column_stats for distribution-aware quality gates."""
    pcts = percentiles or [0.01, 0.25, 0.5, 0.75, 0.99]
    # round, don't truncate (int(0.29*100) == 28), and reject label
    # collisions (0.99 and 0.995 would both render p99)
    labels = [f"p{round(p * 100):02d}" for p in pcts]
    if len(set(labels)) != len(labels):
        raise ValueError(f"percentiles {pcts} collide at integer-percent labels {labels}")
    aggs = []
    for c in columns:
        aggs.append(
            F.percentile_approx(F.col(c).cast("double"), pcts, 10000).alias(f"{c}__p")
        )
        aggs.append(F.avg(F.col(c).cast("double")).alias(f"{c}__mean"))
        aggs.append(F.stddev_pop(F.col(c).cast("double")).alias(f"{c}__std"))
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__std").alias("std"),
                *[F.col(f"{c}__p")[i].alias(labels[i]) for i in range(len(pcts))],
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Histograms + drift
# ---------------------------------------------------------------------------


def histogram_df(df: DataFrame, expr: str, lo: float, hi: float, bins: int = 32) -> DataFrame:
    """Distributed fixed-edge histogram: (bucket int, n long). Bucket 0 is
    underflow, bins+1 overflow (width_bucket semantics); NULLs are dropped."""
    x = F.expr(expr).cast("double")
    return (
        df.select(F.width_bucket(x, F.lit(float(lo)), F.lit(float(hi)), F.lit(bins)).alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def with_ts_gaps(
    df: DataFrame,
    partition_by: list[str] | str = "conv_id",
    order_by: str = "turn_idx",
    ts_col: str = "ts",
    out_col: str = "ts_gap",
) -> DataFrame:
    """Add the inter-row event-time gap in seconds (NULL for each
    partition's first row) — the preprocessing step for the north star's
    ts-gap drift check: ``drift`` rules take a column expression, so the
    window-derived gap materializes here first. One exchange on the
    partition key (the same shuffle the ordering pass uses)."""
    from pyspark.sql.window import Window

    part = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    w = Window.partitionBy(*part).orderBy(order_by)
    t = F.unix_timestamp(ts_col) if dict(df.dtypes).get(ts_col) == "timestamp" else F.col(ts_col).cast("long")
    return df.withColumn(out_col, t - F.lag(t).over(w))


def compute_histogram(df: DataFrame, expr: str, lo: float, hi: float, bins: int = 32) -> dict:
    """Collect a histogram to a plain dict — the stored-baseline format.
    Only `bins+2` rows ever reach the driver."""
    rows = histogram_df(df, expr, lo, hi, bins).collect()
    counts = [0] * (bins + 2)
    for r in rows:
        counts[int(r["bucket"])] = int(r["n"])
    return {"expr": expr, "lo": lo, "hi": hi, "bins": bins, "counts": counts}


def _normalize(counts: list[int], eps: float = 1e-6) -> list[float]:
    total = sum(counts)
    if total == 0:
        return [eps] * len(counts)
    return [max(c / total, eps) for c in counts]


def ks_statistic(p_counts: list[int], q_counts: list[int]) -> float:
    """Two-sample KS on binned data: max |CDF_p - CDF_q|."""
    p, q = _normalize(p_counts), _normalize(q_counts)
    sp = sq = 0.0
    best = 0.0
    for a, b in zip(p, q):
        sp += a
        sq += b
        best = max(best, abs(sp - sq))
    return best


def psi(p_counts: list[int], q_counts: list[int]) -> float:
    """Population Stability Index: sum((p-q) * ln(p/q)) over bins."""
    p, q = _normalize(p_counts), _normalize(q_counts)
    return sum((a - b) * math.log(a / b) for a, b in zip(p, q))


_DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("schema_id", T.StringType()),
        T.StructField("result", T.StringType()),
        T.StructField("instance_name", T.StringType()),
        T.StructField("instance_location", T.StringType()),
        T.StructField("instance_type", T.StringType()),
        T.StructField("absolute_path", T.ArrayType(T.StringType())),
        T.StructField("failing_value", T.StringType()),
        T.StructField("message", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# Stored drift baselines (the --write-baseline/--baseline CLI lifecycle):
# one JSON file under the checkpoint dir mapping rule id → the
# compute_histogram dict, written/read through the Hadoop FS API so the
# checkpoint dir can live on HDFS/S3, not just the local disk.
# ---------------------------------------------------------------------------


def baseline_store_path(checkpoint_dir: str) -> str:
    # underscore prefix: the lineage parquet table lives at the checkpoint
    # root, and Spark's file index skips `_`/`.`-prefixed names (the
    # _SUCCESS convention) — any other name would corrupt lineage reads
    return f"{checkpoint_dir.rstrip('/')}/_drift_baselines.json"


def drift_rule_id(manifest, rule) -> str:
    """The baseline-store key — identical to the violation schema_id."""
    return rule.get("id") or f"{manifest.id}/drift/{rule.params['column']}"


def write_drift_baselines(spark, df: DataFrame, manifest, path: str) -> dict[str, dict]:
    """Compute + persist the baseline histogram for every drift rule in the
    manifest: bucket spec from the rule's lo/hi/bins (falling back to an
    inline baseline's). One distributed histogram pass per rule; ≤ bins+2
    numbers per rule reach the driver/file."""
    import json

    baselines: dict[str, dict] = {}
    for rule in manifest.table_rules:
        if rule.kind != "drift":
            continue
        spec = rule.get("baseline") or {}
        lo = float(rule.get("lo", spec.get("lo", 0.0)))
        hi = float(rule.get("hi", spec.get("hi", 0.0)))
        bins = int(rule.get("bins", spec.get("bins", 32)))
        baselines[drift_rule_id(manifest, rule)] = compute_histogram(
            df, rule.params["column"], lo, hi, bins
        )
    _hadoop_write_text(spark, path, json.dumps(baselines, indent=2))
    return baselines


def load_drift_baselines(spark, path: str) -> dict[str, dict]:
    import json

    return json.loads(_hadoop_read_text(spark, path))


def _hadoop_write_text(spark, path: str, text: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _hadoop_read_text(spark, path: str) -> str:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def drift_violations(engine, df: DataFrame, rule) -> DataFrame:
    """Manifest `drift` rule: compare df's histogram of rule.column (a SQL
    expression, e.g. 'length(text)') against the baseline histogram
    ({lo, hi, bins, counts}) using KS or PSI; one violation row iff the
    statistic exceeds rule.threshold. The baseline is the rule's inline
    ``baseline`` when present, else the engine's stored baselines (the
    --write-baseline/--baseline lifecycle) keyed by rule id; neither
    existing raises loudly rather than silently passing.

    The raw-data pass is a distributed histogram; the drift statistic is
    computed on ≤ bins+2 numbers. At 10^12 rows the scan dominates and
    parallelizes perfectly; nothing row-sized ever reaches the driver.
    """
    rid_key = drift_rule_id(engine.manifest, rule)
    base = rule.get("baseline") or getattr(engine, "drift_baselines", {}).get(rid_key)
    if base is None:
        raise RuntimeError(
            f"drift rule {rid_key!r} has no baseline: inline one in the "
            "manifest or run the CLI with --checkpoint + --write-baseline "
            "first, then validate with --baseline"
        )
    metric = rule.params["metric"]
    threshold = float(rule.params["threshold"])
    expr = rule.params["column"]
    cur = compute_histogram(df, expr, float(base["lo"]), float(base["hi"]), int(base["bins"]))
    stat = ks_statistic(base["counts"], cur["counts"]) if metric == "ks" else psi(base["counts"], cur["counts"])
    spark = df.sparkSession
    rid = rid_key
    if stat <= threshold:
        return spark.createDataFrame([], _DRIFT_SCHEMA)
    msg = rule.get("message") or (
        f"distribution drift on {expr}: {metric}={stat:.6f} exceeds threshold {threshold}"
    )
    row = (
        rid, "FAIL", "table", engine.manifest.table, "TABLE",
        [expr], f"{stat:.6f}", msg,
    )
    return spark.createDataFrame([row], _DRIFT_SCHEMA)
