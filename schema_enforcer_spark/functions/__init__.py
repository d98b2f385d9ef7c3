"""Scalar/column function library (SURVEY.md §2.8) + training-data ops:
text analysis, deduplication, similarity search, time-series joins,
multimodal plumbing."""

from schema_enforcer_spark.functions.dedup import (
    build_minhash_index,
    contamination_scores,
    connected_components,
    exact_dedup,
    exact_dup_groups,
    lsh_bucket_stats,
    match_against_index,
    near_dup_groups,
    minhash_lsh_candidates,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash,
    simhash_hex,
    simhash_near_dups,
    embedding_near_dups,
)
from schema_enforcer_spark.functions.joins import asof_join, range_join_bucketed
from schema_enforcer_spark.functions.sampling import (
    chunk_documents,
    hash_split,
    pack_sequences,
    split_bucket,
    stratified_sample,
)
from schema_enforcer_spark.functions.similarity import (
    brute_force_topk,
    centroid_stats,
    ivf_build,
    ivf_topk,
    lsh_topk,
)
from schema_enforcer_spark.functions.textops import (
    boilerplate_report,
    ngram_doc_freq,
    top_terms,
)

__all__ = [
    "build_minhash_index",
    "contamination_scores",
    "connected_components",
    "match_against_index",
    "near_dup_groups",
    "exact_dedup",
    "exact_dup_groups",
    "lsh_bucket_stats",
    "minhash_lsh_candidates",
    "minhash_near_dups",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_hex",
    "simhash_near_dups",
    "embedding_near_dups",
    "asof_join",
    "range_join_bucketed",
    "hash_split",
    "pack_sequences",
    "split_bucket",
    "brute_force_topk",
    "centroid_stats",
    "ivf_build",
    "ivf_topk",
    "lsh_topk",
    "chunk_documents",
    "stratified_sample",
    "boilerplate_report",
    "ngram_doc_freq",
    "top_terms",
]
