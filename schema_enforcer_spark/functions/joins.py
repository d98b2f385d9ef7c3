"""Time-series join operators Spark lacks natively: as-of join and range
join, built from compositions of existing DataFrame ops (no UDF, no driver
loop).

Scale design:
- ``asof_join`` is the merge-based formulation: tag + union both sides,
  ONE shuffle on the key, one window sort by (time, side), then a running
  ``last(..., ignorenulls)`` carries the most recent right-side payload
  forward onto left rows. Cost = one exchange + one sort — the same shape a
  dedicated as-of physical operator would produce, and strictly better than
  the naive inequality join (which Spark plans as a broadcast-nested-loop
  or a cartesian range product).
- ``range_join_bucketed`` turns an interval containment join into an
  equi-join on overlapping buckets (the standard bucketed range-join trick
  Spark's open-source build lacks), so Catalyst plans a hash join instead
  of BNLJ; exact containment is re-checked post-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the right row with the LARGEST
    right_time <= left_time within the same key group (ties on time: the
    right row is visible to left rows at the identical timestamp).

    Right (key, time) pairs should be unique for deterministic output —
    pre-aggregate the right side otherwise.
    """
    rcols = right_cols or [c for c in right.columns if c not in on and c != right_time]
    # the right payload travels as ONE struct so last(ignorenulls) picks the
    # most recent right ROW atomically — per-column carries would back-fill a
    # NULL field of the newest row from an older row, mixing right rows
    r_struct = F.struct(*[F.col(c) for c in rcols]).alias("_rrow")
    r_tag = right.select(
        *on,
        F.col(right_time).cast(left.schema[left_time].dataType).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*[F.col(c) for c in left.columns]).alias("x")).schema["x"].dataType).alias("_lrow"),
        r_struct,
    )
    l_tag = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r_tag.schema["_rrow"].dataType).alias("_rrow"),
    )
    # right rows sort BEFORE left rows at equal _t (side 0 < 1) so an
    # equal-timestamp right row is already visible
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_lrow",
        F.last("_rrow", ignorenulls=True).over(w).alias("_rrow"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_rrow")[c].alias(f"{c}{suffix}") for c in rcols],
    )
    return out


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """point ∈ [start, end] containment join as an equi-join: each interval
    explodes into the buckets it overlaps, each point hashes to one bucket,
    Catalyst plans a hash join on (bucket [+ on-keys]) instead of a
    nested-loop inequality join. bucket_width should approximate the median
    interval length (wider = fewer replicas, more post-filtering). ``on``
    adds extra equi-join keys (e.g. the same user's intervals only), which
    also tightens the shuffle key against bucket skew."""
    p = points.withColumn("_bucket", (F.col(point_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("long"),
                (F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    keys = ["_bucket"] + list(on or [])
    return p.join(iv, keys).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    ).drop("_bucket")
