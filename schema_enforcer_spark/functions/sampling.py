"""Dataset split / packing operators for training-data pipelines.

- ``hash_split``: deterministic, engine-portable train/val/test assignment.
  Spark's own ``randomSplit`` is partition-order-dependent and
  ``xxhash64`` is Spark-specific; an md5-derived bucket is reproducible
  across engines and stable under repartitioning — the property a
  training-data lineage audit actually needs.
- ``pack_sequences``: assign documents to fixed-token-budget batches
  (sequence packing) via a running token-count window per shard — the
  deterministic streaming-greedy approximation of bin packing (true bin
  packing is NP-hard and order-dependent; a running cumsum is what
  large-scale packers actually do per shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def split_bucket(id_col: Column, seed: int = 42, buckets: int = 10000) -> Column:
    """Deterministic bucket in [0, buckets): md5 of (id, seed), first 8 hex
    chars as an integer. Engine-portable (md5 + substring exist everywhere),
    row-stable (no partition-order dependence)."""
    h = F.conv(F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f"|{seed}"))), 1, F.lit(8)), 16, 10)
    return F.pmod(h.cast("long"), F.lit(buckets))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with the
    given fractions (must sum to ≤ 1; remainder rows get the LAST split).
    Assignment is a pure function of the id — adding or removing other rows
    never reassigns existing ones (unlike randomSplit)."""
    if not fractions:
        raise ValueError("hash_split needs at least one named split")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    buckets = 10000
    b = split_bucket(F.col(id_col), seed, buckets)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        # round, don't truncate: float accumulation error would shift
        # boundary buckets (int(0.7999999999999999*10000) == 7999)
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum downsampling (the domain-reweighting /
    temperature-sampling primitive): keep a row iff its md5 bucket falls
    under its stratum's rate. Pure filter — no shuffle, no sort, no
    randomness; re-runs and repartitions keep exactly the same rows, and a
    stratum's sample only grows monotonically when its rate is raised (the
    property an ablation grid needs). Unknown strata use default_rate.
    """
    for name, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"stratified_sample rate for {name!r} must be in [0, 1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    buckets = 10000
    b = split_bucket(F.col(id_col), seed, buckets)
    # round, don't truncate — same boundary hazard as hash_split
    cutoff = None
    for name, r in rates.items():
        cond = F.col(stratum_col).eqNullSafe(F.lit(name))
        lim = F.lit(int(round(r * buckets)))
        cutoff = F.when(cond, lim) if cutoff is None else cutoff.when(cond, lim)
    cutoff = (
        cutoff.otherwise(F.lit(int(round(default_rate * buckets))))
        if cutoff is not None
        else F.lit(int(round(default_rate * buckets)))
    )
    return df.filter(b < cutoff)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window document chunking (context-window preprocessing):
    split each doc's whitespace tokens into windows of `chunk_tokens` with
    `overlap` tokens shared between consecutive windows (stride =
    chunk_tokens - overlap); the final window may be short. Emits
    (id, chunk_idx, n_chunk_tokens, chunk_text).

    All pure expressions: tokenize once (projection barrier), build the
    window index with integer math (no float ceil — oracle-exact), slice +
    posexplode. scan → project → generate; zero shuffles, codegen
    throughout. Empty/whitespace-only docs emit no chunks.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    staged = df.withColumn("_toks", toks).withColumn("_n", F.size("_toks"))
    # chunks = 1 + ceil(max(n - chunk, 0) / stride), via integer ceil-div
    extra = F.greatest(F.col("_n") - chunk_tokens, F.lit(0))
    n_chunks = (F.lit(1) + F.floor((extra + (stride - 1)) / F.lit(stride))).cast("int")
    windows = F.when(
        F.col("_n") > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(F.col("_toks"), i * stride + 1, chunk_tokens),
        ),
    )
    return (
        staged.select(F.col(id_col), F.posexplode(windows).alias("chunk_idx", "_w"))
        .select(
            id_col,
            "chunk_idx",
            F.size("_w").alias("n_chunk_tokens"),
            F.concat_ws(" ", "_w").alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    shard_by: str,
    order_by: str,
    budget: int,
) -> DataFrame:
    """Assign each document a ``pack_id`` so consecutive documents (by
    order_by, within shard_by) accumulate roughly *budget* tokens per pack:
    pack_id = floor((running_tokens - tokens) / budget). One exchange on the
    shard key. A document larger than the budget may still share its pack
    with the small documents that preceded it within the budget (pack sizes
    can exceed budget by up to one document); the NEXT document always
    starts a fresh pack."""
    w = Window.partitionBy(shard_by).orderBy(order_by).rowsBetween(Window.unboundedPreceding, 0)
    running = F.sum(token_col).over(w)
    return df.withColumn("pack_id", F.floor((running - F.col(token_col)) / budget).cast("long"))
