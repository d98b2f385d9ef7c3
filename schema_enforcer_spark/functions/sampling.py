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
