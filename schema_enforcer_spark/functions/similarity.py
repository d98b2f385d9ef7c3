"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k against a query vector — one
  scan, the dot product entirely in codegen (zip_with/aggregate), top-k via
  orderBy+limit (Spark's TakeOrderedAndProject — no full sort, each
  partition keeps k candidates then the driver merges k·P rows).
- ``lsh_topk``: the scale path — deterministic hyperplane LSH buckets
  (shared with dedup); the query probes only its own bucket (+ optional
  multi-probe neighbors at hamming distance 1), turning a 10^12-row scan
  into a bucket-pruned one. Recall < 1.0 by construction; the bench
  measures recall vs the brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from schema_enforcer_spark.functions.dedup import _bits_from_dots, _hyperplanes, _multi_dots, cosine


def _query_lit(query_vec: list[float]):
    # ONE py4j call: F.lit(list) builds the whole array literal server-side.
    # The element-wise form (F.array(*[F.lit(x) ...])) costs a py4j round
    # trip per element — 64-dim vectors × several planes per query added
    # SECONDS of driver-side plan-construction time (measured in bench,
    # where every timing iteration rebuilds the DataFrame).
    return F.lit([float(x) for x in query_vec])


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    q = _query_lit(query_vec)
    sim = F.round(cosine(F.col(vec_col), q), 6).alias("cosine")
    return (
        df.select(F.col(id_col), sim)
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: score only rows whose hyperplane bucket is the query's
    (or differs in one bit when multiprobe). The bucket predicate is a plain
    string comparison ⇒ pushes into the scan after bucketing is materialized."""
    if len(query_vec) != dim:
        # Python zip truncates while Spark zip_with null-pads: a mismatch
        # would silently bucket every row to all-zeros and return 0 rows
        raise ValueError(f"query_vec has {len(query_vec)} dims but dim={dim}")
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = "".join("1" if sum(a * b for a, b in zip(query_vec, p)) >= 0 else "0" for p in planes)
    probes = {qbits}
    if multiprobe:
        for i in range(n_planes):
            flipped = qbits[:i] + ("0" if qbits[i] == "1" else "1") + qbits[i + 1:]
            probes.add(flipped)
    # one-pass multi-plane dots, staged so the n_planes sign tests (and the
    # pushed-down bucket filter) reference the materialized dots column
    # instead of re-running the fold once per plane (see dedup._multi_dots)
    staged = df.select(
        F.col(id_col), F.col(vec_col), _multi_dots(F.col(vec_col), planes).alias("_dots")
    )
    return (
        staged.select(
            F.col(id_col), F.col(vec_col), _bits_from_dots(F.col("_dots"), n_planes).alias("_bucket")
        )
        .filter(F.col("_bucket").isin(*sorted(probes)))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), _query_lit(query_vec)), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_build(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    seed: int = 42,
    sample_fraction: float = 0.1,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index build: deterministic centroids via one Lloyd refinement of
    a hash-sampled seed set, then assign each vector to its nearest cell.

    Returns (assigned_df with a ``_cell`` column, centroids). At scale the
    assigned table is written bucketed by ``_cell`` so probes prune whole
    files; the centroid refinement is one groupBy over a sample — the
    k-means analogue without iterative driver loops (1 refinement pass is
    the standard IVF-flat recipe; more passes = marginal recall).
    """
    # seed centroids: hash-deterministic sample, first n_cells by id hash
    seeds = (
        df.select(F.col(id_col), F.col(vec_col))
        .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .withColumn("_h", F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_003)))
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    )
    if len(seeds) < n_cells:
        raise ValueError(
            f"ivf_build needs at least n_cells={n_cells} non-null {dim}-dim vectors, found {len(seeds)}"
        )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]

    def _nearest(vec: Column, cents: list[list[float]]) -> Column:
        # argmin over squared L2 distance via array_min over (d, cell)
        # structs — LINEAR expression size. The previous when-chain fold
        # (`when(pair.d < best.d, pair).otherwise(best)`) referenced `best`
        # twice per level, doubling the tree per centroid: 2^n_cells subtree
        # copies blew the driver heap at plan build for n_cells=16. The
        # per-centroid distance stays a zip_with/aggregate HOF (interpreted
        # but linear; unrolling all n_cells×dim terms into codegen
        # arithmetic makes janino's recursive compiler fail outright).
        # Ties pick the lower cell index (lexicographic struct ordering —
        # same as the old strict-< fold).
        pairs = []
        for ci, c in enumerate(cents):
            d = F.aggregate(
                F.zip_with(
                    vec,
                    F.lit([float(x) for x in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            pairs.append(F.struct(d.alias("d"), F.lit(ci).alias("cell")))
        return F.array_min(F.array(*pairs))["cell"]

    sample = df.sample(fraction=sample_fraction, seed=seed).withColumn("_cell", _nearest(F.col(vec_col), centroids))
    refined_rows = (
        sample.groupBy("_cell")
        .agg(*[F.avg(F.col(vec_col)[i].cast("double")).alias(f"c{i}") for i in range(dim)])
        .collect()
    )
    refined = list(centroids)
    for r in refined_rows:
        # a cell whose sampled vectors have NULL entries for some dimension
        # keeps its seed centroid for those dims instead of crashing
        refined[r["_cell"]] = [
            float(r[f"c{i}"]) if r[f"c{i}"] is not None else centroids[r["_cell"]][i]
            for i in range(dim)
        ]

    assigned = df.withColumn("_cell", _nearest(F.col(vec_col), refined))
    return assigned, refined


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: score only the nprobe cells whose centroids are closest
    to the query — the scan prunes to ~nprobe/n_cells of the table."""
    dists = sorted(
        range(len(centroids)),
        key=lambda ci: sum((a - b) ** 2 for a, b in zip(query_vec, centroids[ci])),
    )
    probe_cells = dists[:nprobe]
    return (
        assigned.filter(F.col("_cell").isin(probe_cells))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), _query_lit(query_vec)), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def centroid_stats(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid statistics (the IVF-cell / class-prototype quality
    pass): for every (label, dimension), the member count and the centroid
    coordinate quantized at 1e-6.

    Determinism: float sums are order-dependent, so each element is floored
    to an integer micro-unit FIRST (floor(v * 1e6) as bigint) and the sum
    runs in exact integer arithmetic — associative, engine-portable, oracle-
    replicable bit-for-bit. The centroid coordinate is the integer floor-div
    mean (mean_e6). Shape: one posexplode (dim × rows) → one shuffle on
    (label, dim) with map-side partial agg; no collect, no all-pairs.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "_v"),
    )
    return (
        exploded.withColumn("_e6", F.floor(F.col("_v").cast("double") * 1e6).cast("long"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("_e6").alias("_sum_e6"),
        )
        .select(
            "label",
            "dim",
            "n_vecs",
            (F.col("_sum_e6") - F.pmod(F.col("_sum_e6"), F.col("n_vecs")))
            .cast("long")
            .alias("_num"),
        )
        .select(
            "label",
            "dim",
            "n_vecs",
            (F.col("_num") / F.col("n_vecs")).cast("long").alias("mean_e6"),
        )
    )


def topk_per_probe_recall(df: DataFrame, query_vec: list[float], k: int, **kw) -> float:
    """Recall@k of lsh_topk vs brute force — bench/diagnostic helper."""
    exact = {r[0] for r in brute_force_topk(df, query_vec, k, **{k_: v for k_, v in kw.items() if k_ in ("vec_col", "id_col")}).collect()}
    approx = {r[0] for r in lsh_topk(df, query_vec, k, **kw).collect()}
    return len(exact & approx) / max(len(exact), 1)
