"""Deterministic synthetic transcripts generator (FIXTURES.md §1-§3).

Shape is the authoritative input_hint table:
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` + an explicit ``partition_id`` column (the
Parquet-mode stand-in for Iceberg ``bucket(N, conv_id)``).

Everything is generated with pure Spark expressions derived from
``spark.range`` + deterministic hashes — no driver-side loops, no Python
randomness — so the same generator scales from the pytest corpus (~10²
rows) to bench scale (~10⁷) to the design scale (10¹²) unchanged.

The skew knob (``hot_convs``/``hot_turns``) creates the hot-conversation
long tail the north_rule requires salted repartitioning for.

Violation injection (``inject``) mirrors the reference's golden-test
corpus: one defect case per table variant with exactly-known offending
keys (/root/reference/schema_enforcer/schemas/manager.py:185-256 layout,
re-expressed at table grain per FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "the", "and", "is", "of", "to", "in",
]

CASES = [
    "invalid_enum", "missing_required", "invalid_pattern", "dup_turn",
    "orphan_conv", "disordered", "agg_threshold", "non_contiguous",
    "extra_column", "out_of_range",
]


def _h(seed: int, *cols) -> F.Column:
    """Deterministic non-negative hash column."""
    return F.abs(F.hash(F.lit(seed), *cols))


def gen_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    seed: int = 42,
    hot_convs: int = 0,
    hot_turns: int = 1000,
    num_buckets: int = 32,
) -> DataFrame:
    """Clean transcripts table. Turn counts 5-14 per conversation, except
    the first ``hot_convs`` conversations which get ``hot_turns`` turns."""
    convs = spark.range(n_convs).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("_cidx"),
    )
    size = F.when(F.col("_cidx") < hot_convs, F.lit(hot_turns)).otherwise(
        5 + F.pmod(_h(seed, F.col("_cidx")), F.lit(10))
    )
    turns = convs.select(
        "conv_id", "_cidx", F.explode(F.sequence(F.lit(0), size - 1)).alias("turn_idx")
    )
    h = _h(seed, F.col("_cidx"), F.col("turn_idx"))
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.pmod(h, F.lit(10)) == 9, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    n_words = 3 + F.pmod(h, F.lit(30))
    words_arr = F.lit(list(WORDS))  # one py4j call, not one per word
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.get(words_arr, F.pmod(_h(seed + 1, F.col("_cidx"), F.col("turn_idx"), i), F.lit(len(WORDS)))),
        ),
    )
    base = F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    # ts monotonic per conv: cumulative hash-derived gaps under the W1 window
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = (5 + F.pmod(h, F.lit(55))).cast("long")
    out = (
        turns.withColumn("_gap", gap)
        .withColumn("_off", F.sum("_gap").over(w))
        .select(
            F.col("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            role.alias("role"),
            text.alias("text"),
            F.when(role == "tool", F.format_string("tool_%d", F.pmod(h, F.lit(5)))).alias("tool"),
            (base + F.make_interval(secs=(F.col("_cidx") * 86400 + F.col("_off")).cast("double"))).alias("ts"),
        )
        .withColumn("partition_id", F.pmod(F.hash("conv_id"), F.lit(num_buckets)))
    )
    return out


def gen_conversations(spark: SparkSession, n_convs: int = 100, seed: int = 42) -> DataFrame:
    """Companion dimension (FIXTURES.md §2): referential-integrity target."""
    return spark.range(n_convs).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        F.get(F.array(F.lit("api"), F.lit("web"), F.lit("batch")), F.pmod(_h(seed + 2, F.col("id")), F.lit(3))).alias("channel"),
        F.to_timestamp(F.lit("2025-12-31 00:00:00")).alias("created_ts"),
    )


def _conv(i: int) -> str:
    return f"conv-{i:08d}"


# Exactly-known offending keys per case, so pytest goldens are hand-checkable.
INJECTION_KEYS = {
    "invalid_enum": [(_conv(1), 1)],          # role -> 'operator'
    "missing_required": [(_conv(2), 1), (_conv(2), 2)],  # text NULL / role NULL
    "invalid_pattern": [(_conv(3), 1)],        # role->tool with bad tool name
    "dup_turn": [(_conv(4), 2)],               # duplicated (conv_id, turn_idx)
    "orphan_conv": [("conv-99999999", 0)],     # conv absent from dimension
    "disordered": [(_conv(5), 3)],             # ts pushed before previous turn
    "agg_threshold": [_conv(6)],               # whole conv: no assistant turns
    "non_contiguous": [(_conv(7), 2)],         # turn_idx 2 -> 20
    "out_of_range": [(_conv(8), 1)],           # turn_idx -> -1 (min bound)
}


def inject(df: DataFrame, case: str) -> DataFrame:
    """Return a defective variant of *df* for one FIXTURES.md §3 case."""
    key = lambda c, t: (F.col("conv_id") == c) & (F.col("turn_idx") == t)  # noqa: E731
    if case == "invalid_enum":
        (c, t), = INJECTION_KEYS[case]
        return df.withColumn("role", F.when(key(c, t), F.lit("operator")).otherwise(F.col("role")))
    if case == "missing_required":
        (c1, t1), (c2, t2) = INJECTION_KEYS[case]
        return df.withColumn(
            "text", F.when(key(c1, t1), F.lit(None)).otherwise(F.col("text"))
        ).withColumn("role", F.when(key(c2, t2), F.lit(None)).otherwise(F.col("role")))
    if case == "invalid_pattern":
        (c, t), = INJECTION_KEYS[case]
        return df.withColumn(
            "role", F.when(key(c, t), F.lit("tool")).otherwise(F.col("role"))
        ).withColumn("tool", F.when(key(c, t), F.lit("Bad-Tool!")).otherwise(F.col("tool")))
    if case == "dup_turn":
        (c, t), = INJECTION_KEYS[case]
        return df.unionByName(df.filter(key(c, t)))
    if case == "orphan_conv":
        (c, _), = INJECTION_KEYS[case]
        extra = df.limit(1).select(
            F.lit(c).alias("conv_id"), *[F.col(x) for x in df.columns if x not in ("conv_id", "partition_id")],
            F.pmod(F.hash(F.lit(c)), F.lit(32)).alias("partition_id"),
        ).select(*df.columns)
        return df.unionByName(extra)
    if case == "disordered":
        (c, t), = INJECTION_KEYS[case]
        return df.withColumn(
            "ts", F.when(key(c, t), F.col("ts") - F.expr("INTERVAL 1 DAY")).otherwise(F.col("ts"))
        )
    if case == "agg_threshold":
        (c,) = INJECTION_KEYS[case]
        return df.withColumn(
            "role",
            F.when((F.col("conv_id") == c) & (F.col("role") == "assistant"), F.lit("user")).otherwise(F.col("role")),
        ).withColumn("tool", F.when(F.col("conv_id") == c, F.lit(None)).otherwise(F.col("tool")))
    if case == "non_contiguous":
        (c, t), = INJECTION_KEYS[case]
        return df.withColumn(
            "turn_idx", F.when(key(c, t), F.lit(20)).otherwise(F.col("turn_idx")).cast("int")
        )
    if case == "out_of_range":
        (c, t), = INJECTION_KEYS[case]
        return df.withColumn(
            "turn_idx", F.when(key(c, t), F.lit(-1)).otherwise(F.col("turn_idx")).cast("int")
        )
    if case == "extra_column":
        return df.withColumn("debug_blob", F.lit("x"))
    raise ValueError(f"unknown case {case!r}; known: {sorted(INJECTION_KEYS) + ['extra_column']}")


# ---------------------------------------------------------------------------
# Planted-cluster embeddings (the ANN credible-recall corpus)
# ---------------------------------------------------------------------------
#
# Uniform-random embeddings are the adversarial case for space-partitioning
# ANN (bucket membership barely correlates with cosine rank); real embedding
# tables cluster. This generator plants n_clusters centers and scatters
# members around them with small deterministic noise — every value derives
# from md5(vec_id/cluster, dim) so an ANSI-SQL oracle replicates the table
# bit-for-bit (same trick as the fingerprint/hash-split oracles).


def _md5_unit(s: F.Column) -> F.Column:
    """md5-derived value in [-1, 1]: hex2int(first 8 hex chars) % 2001 maps
    to 0..2000, then /1000 - 1. Exact integer steps + IEEE double ops in a
    fixed order — engine-portable."""
    h = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    return (h % 2001) / F.lit(1000.0) - F.lit(1.0)


def clustered_embedding(
    id_col: str, dim: int = 64, n_clusters: int = 32, noise: float = 0.05
) -> F.Column:
    """array<double> embedding for a row id: center(id % n_clusters) plus
    noise·unit — one expression, no UDF, no driver data."""
    c = (F.col(id_col) % n_clusters).cast("string")
    i = F.col(id_col).cast("string")
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: _md5_unit(F.concat_ws(":", c, d.cast("string")))
        + _md5_unit(F.concat_ws("#", i, d.cast("string"))) * F.lit(noise),
    )


def cluster_centers_df(spark: SparkSession, n_clusters: int = 32, dim: int = 64) -> DataFrame:
    """The planted centers as a tiny (_cluster, _center array<double>) frame
    — md5 formula identical to clustered_embedding's center term. The
    center term depends only on (cluster, dim): broadcast-joining this
    32-row frame under the corpus computes each center's ``dim`` md5s ONCE
    per cluster instead of once per ROW (r7: halved the md5 count of the
    synthetic clustered corpus)."""
    return spark.range(n_clusters).select(
        F.col("id").alias("_cluster"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: _md5_unit(
                F.concat_ws(":", F.col("id").cast("string"), d.cast("string"))
            ),
        ).alias("_center"),
    )


def with_clustered_embedding(
    df: DataFrame,
    id_col: str,
    dim: int = 64,
    n_clusters: int = 32,
    noise: float = 0.05,
) -> DataFrame:
    """df + an ``embedding`` column, value-identical to
    ``clustered_embedding(id_col)`` (same md5 strings, same c + n·noise
    double ops in the same order) but with the center term coming from a
    broadcast join of :func:`cluster_centers_df` — per-row work drops from
    2·dim md5s to dim (the noise term, genuinely per-row)."""
    centers = cluster_centers_df(df.sparkSession, n_clusters, dim)
    i = F.col(id_col).cast("string")
    emb = F.zip_with(
        F.col("_center"),
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda c, d: c + _md5_unit(F.concat_ws("#", i, d.cast("string"))) * F.lit(noise),
    )
    return (
        df.withColumn("_cluster", F.col(id_col) % n_clusters)
        .join(F.broadcast(centers), "_cluster")
        .withColumn("embedding", emb)
        .drop("_cluster", "_center")
    )


def gen_clustered_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    n_clusters: int = 32,
    noise: float = 0.05,
    id_col: str = "vec_id",
) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias(id_col),
        clustered_embedding("id", dim, n_clusters, noise).alias("embedding"),
    )


def cluster_center(cluster: int, dim: int = 64) -> list[float]:
    """The planted center as Python floats — the query vector for recall
    tests and the q55 oracle (same md5 formula, driver-side)."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{cluster}:{d}".encode()).hexdigest()[:8], 16)
        out.append((h % 2001) / 1000.0 - 1.0)
    return out
