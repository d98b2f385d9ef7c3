"""Round-3 pipeline operators: boilerplate n-gram detection, document
chunking, stratified sampling, quantile accuracy, embedding centroids.
Each is checked against a small hand-computable fixture (the oracle-SQL
twins in __spark_entry__ cover the at-scale parity)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from schema_enforcer_spark.functions.sampling import (
    chunk_documents,
    hash_split,
    split_bucket,
    stratified_sample,
)
from schema_enforcer_spark.functions.textops import boilerplate_report, ngram_doc_freq
from schema_enforcer_spark.functions.similarity import centroid_stats
from schema_enforcer_spark.stats import quantile_accuracy_report


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_report_marks_frequent_grams(spark):
    shared = "all rights reserved copyright notice"
    rows = [
        (0, f"unique alpha words here {shared}"),
        (1, f"other beta content {shared}"),
        (2, f"third gamma thing {shared}"),
        (3, "totally different text with no overlap at all"),
        (4, "ab"),  # < n tokens: zero grams
    ]
    out = {
        r["doc_id"]: r
        for r in boilerplate_report(_docs(spark, rows), n=4, min_df=3).collect()
    }
    assert out[4]["n_grams"] == 0 and out[4]["boilerplate_fraction"] == 0.0
    assert out[3]["n_boilerplate"] == 0
    # the shared tail's grams appear in docs 0,1,2 → df=3 → boilerplate
    for d in (0, 1, 2):
        assert out[d]["n_boilerplate"] >= 2  # grams fully inside the shared span
        assert 0.0 < out[d]["boilerplate_fraction"] <= 1.0
    # doc frequency surface agrees
    freq = {r["gram"]: r["doc_freq"] for r in ngram_doc_freq(_docs(spark, rows), n=4).collect()}
    assert freq["all rights reserved copyright"] == 3


def test_boilerplate_broadcast_guard_trips(spark):
    """min_df=1 makes EVERY gram 'frequent' — the pre-broadcast count guard
    must refuse to ship that head instead of broadcasting unbounded data."""
    rows = [(i, f"doc {i} has its very own unique ngram tail {i}") for i in range(6)]
    with pytest.raises(RuntimeError, match="max_broadcast_grams"):
        boilerplate_report(_docs(spark, rows), n=4, min_df=1, max_broadcast_grams=3)
    # the same corpus under the default limit still works
    assert boilerplate_report(_docs(spark, rows), n=4, min_df=1).count() == 6


def test_chunk_documents_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    rows = [(0, text), (1, "one two"), (2, ""), (3, None)]
    out = chunk_documents(_docs(spark, rows), chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 10 tokens, chunk 4, stride 2 → 1 + ceil(6/2) = 4 chunks
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    assert [r["chunk_text"] for r in c0] == [
        "w0 w1 w2 w3",
        "w2 w3 w4 w5",
        "w4 w5 w6 w7",
        "w6 w7 w8 w9",
    ]
    assert [r["n_chunk_tokens"] for r in c0] == [4, 4, 4, 4]
    # short doc: single (short) chunk; empty/null docs: no chunks
    assert [r["chunk_text"] for r in by_doc[1]] == ["one two"]
    assert 2 not in by_doc and 3 not in by_doc
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, rows), chunk_tokens=4, overlap=4)


def test_stratified_sample_deterministic_and_monotone(spark):
    rows = [(i, "en" if i % 3 == 0 else ("zh" if i % 3 == 1 else "de")) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = stratified_sample(df, "doc_id", "lang", {"en": 0.5, "zh": 0.2}, default_rate=0.0)
    ids = {r["doc_id"] for r in kept.collect()}
    # exact replication: the bucket rule is a pure function of the id
    buckets = {r["doc_id"]: r["b"] for r in df.select("doc_id", split_bucket(F.col("doc_id")).alias("b")).collect()}
    expect = {
        i
        for i, lang in rows
        if buckets[i] < {"en": 5000, "zh": 2000}.get(lang, 0)
    }
    assert ids == expect
    assert all(lang != "de" for i, lang in rows if i in ids)
    # monotone: raising a rate only ever ADDS rows
    more = {
        r["doc_id"]
        for r in stratified_sample(df, "doc_id", "lang", {"en": 0.8, "zh": 0.2}).collect()
    }
    assert ids <= more
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(df, "doc_id", "lang", {"en": 1.5})


def test_quantile_accuracy_within_tolerance(spark):
    df = spark.range(10000).select((F.col("id") % 1000).cast("double").alias("v"))
    out = quantile_accuracy_report(df, "v", ps=(0.25, 0.5, 0.9), accuracy=10000).collect()
    assert len(out) == 3
    assert all(r["n_total"] == 10000 for r in out)
    assert all(r["within_tolerance"] for r in out)
    # heavy duplicates: a single value owns a wide rank interval — the
    # interval check must still hold (a point check would fail here)
    const = spark.range(5000).select(F.lit(7.0).alias("v"))
    out2 = quantile_accuracy_report(const, "v", ps=(0.5,)).collect()
    assert out2[0]["within_tolerance"]


def test_centroid_stats_exact_integer_means(spark):
    rows = [
        (0, [1.0, -2.5], 10),
        (1, [3.0, 0.5], 10),
        (2, [5.0, 1.25], 20),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r["label"], r["dim"]): r for r in centroid_stats(df).collect()}
    assert out[(10, 0)]["n_vecs"] == 2
    assert out[(10, 0)]["mean_e6"] == 2_000_000  # mean(1.0, 3.0)
    assert out[(10, 1)]["mean_e6"] == -1_000_000  # mean(-2.5, 0.5) = -1.0
    assert out[(20, 1)]["mean_e6"] == 1_250_000
    # floor-div semantics on negative sums: mean(-2.5, 0.5) floored at 1e-6
    assert out[(10, 1)]["n_vecs"] == 2


def test_top_terms_integer_ranking(spark):
    from schema_enforcer_spark.functions.textops import top_terms

    rows = [
        (0, "apple apple banana cherry"),   # tf: apple 2; banana/cherry tie on tf
        (1, "banana banana cherry"),
        (2, "cherry"),
    ]
    df = _docs(spark, rows)
    out = {}
    for r in top_terms(df, k=2).collect():
        out.setdefault(r["doc_id"], []).append((r["rk"], r["term"], r["tf"], r["doc_freq"]))
    for v in out.values():
        v.sort()
    # doc 0: apple wins on tf; banana (df=2) beats cherry (df=3) on the
    # doc-frequency tiebreak even though both have tf=1
    assert out[0] == [(1, "apple", 2, 1), (2, "banana", 1, 2)]
    assert out[1][0] == (1, "banana", 2, 2)
    assert out[2] == [(1, "cherry", 1, 3)]
