"""Measure ANN recall vs brute force and record it in BENCH/BASELINE.md.

The approximate operators (lsh_topk with q19's exact parameters; IVF with
defaults) ship with a deterministic oracle twin for CORRECTNESS, but an
approximate index is only honest with a measured recall number against the
exact answer — this writes recall@k at sf0.1 into the baseline doc.

Usage: python tools/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARK_BEGIN = "<!-- ann-recall:begin -->"
MARK_END = "<!-- ann-recall:end -->"


def main() -> None:
    from pyspark.sql import SparkSession

    from __spark_entry__ import QUERY_VEC
    from schema_enforcer_spark.functions.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_topk,
        topk_per_probe_recall,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ivf_sf_dir = os.environ.get("ANN_IVF_SF_DIR", sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    k = 20

    # q19's exact parameters (n_planes=8, multiprobe hamming-1)
    recall_lsh = topk_per_probe_recall(emb, QUERY_VEC, k, n_planes=8, multiprobe=True)
    recall_lsh_np = topk_per_probe_recall(emb, QUERY_VEC, k, n_planes=8, multiprobe=False)

    # IVF runs at the same sf as LSH since the nearest-centroid argmin
    # became linear (array_min over (d, cell) structs — the old when-chain
    # fold doubled the expression tree per centroid and OOMed the driver at
    # plan build)
    emb_ivf = spark.read.parquet(f"{ivf_sf_dir}/embeddings.parquet")
    n_ivf = emb_ivf.count()
    assigned, cents = ivf_build(emb_ivf, n_cells=16)
    exact = {r[0] for r in brute_force_topk(emb_ivf, QUERY_VEC, k).collect()}
    ivf4 = {r[0] for r in ivf_topk(assigned, cents, QUERY_VEC, k, nprobe=4).collect()}
    ivf8 = {r[0] for r in ivf_topk(assigned, cents, QUERY_VEC, k, nprobe=8).collect()}
    recall_ivf4 = len(exact & ivf4) / k
    recall_ivf8 = len(exact & ivf8) / k

    # clustered corpus (q55): the realistic case — same operators, same
    # shipped parameters, planted 32-cluster structure (synth)
    from __spark_entry__ import ANN_QUERY_CLUSTER
    from schema_enforcer_spark.functions.similarity import lsh_topk
    from schema_enforcer_spark.synth import cluster_center, gen_clustered_embeddings

    n_cl = 2000
    emb_cl = gen_clustered_embeddings(spark, n_cl, dim=64, n_clusters=32).cache()
    q_cl = cluster_center(ANN_QUERY_CLUSTER)
    exact_cl = {r[0] for r in brute_force_topk(emb_cl, q_cl, k).collect()}
    lsh_cl = {r[0] for r in lsh_topk(emb_cl, q_cl, k, n_planes=8, multiprobe=True).collect()}
    recall_lsh_cl = len(exact_cl & lsh_cl) / k
    assigned_cl, cents_cl = ivf_build(emb_cl, n_cells=32)
    ivf_cl = {r[0] for r in ivf_topk(assigned_cl, cents_cl, q_cl, k, nprobe=4).collect()}
    recall_ivf_cl = len(exact_cl & ivf_cl) / k
    emb_cl.unpersist()

    section = f"""{MARK_BEGIN}
## ANN recall vs brute force (tools/ann_recall.py)

Recall@{k} against the exact cosine top-{k} over {n:,} embeddings
({sf_dir}), query = the q14/q19 QUERY_VEC:

| operator | parameters | recall@{k} |
|---|---|---|
| lsh_topk (q19) | 8 hyperplanes, multiprobe hamming-1 (9 probes) | {recall_lsh:.2f} |
| lsh_topk | 8 hyperplanes, single probe | {recall_lsh_np:.2f} |
| ivf_topk ({n_ivf:,} vecs, {ivf_sf_dir}) | 16 cells, nprobe=4 | {recall_ivf4:.2f} |
| ivf_topk ({n_ivf:,} vecs, {ivf_sf_dir}) | 16 cells, nprobe=8 | {recall_ivf8:.2f} |

The oracle gate (q19) checks the approximate result DETERMINISTICALLY (the
DuckDB twin replicates the probes exactly); this table is the complementary
honesty number — how much of the true top-{k} the pruned scan retains.
NOTE: the driver's synthetic embeddings are uniformly random (no cluster
structure), the adversarial case for space-partitioning ANN — bucket
membership barely correlates with cosine rank, so these recalls are FLOOR
values; clustered real-world embeddings bucket far better. Single-probe
recall@20 is capped near n/(k·2^planes) by bucket size alone.

**Clustered corpus (the realistic case — q55, synth planted 32 clusters,
{n_cl:,} vecs, query = a planted center):** the SAME shipped parameters
reach production-credible recall; asserted >= 0.8 by
tests/test_functions.py::test_ann_recall_on_clustered_embeddings.

| operator | parameters | recall@{k} |
|---|---|---|
| lsh_topk (q55 = q19 config) | 8 hyperplanes, multiprobe hamming-1 | {recall_lsh_cl:.2f} |
| ivf_topk | 32 cells, nprobe=4 | {recall_ivf_cl:.2f} |
{MARK_END}"""

    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    if MARK_BEGIN in text:
        text = re.sub(
            re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END), section, text, flags=re.S
        )
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)
    print(f"lsh multiprobe={recall_lsh:.2f} single={recall_lsh_np:.2f} "
          f"ivf4={recall_ivf4:.2f} ivf8={recall_ivf8:.2f} → BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
