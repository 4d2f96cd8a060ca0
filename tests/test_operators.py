"""Operator smoke + semantics tests at sf0.001 (full oracle parity is the
driver's CORRECTNESESS gate; tools/check_oracles.py replicates it locally)."""

from __future__ import annotations

import pytest

from unipdf_spark.operators import all_oracles, all_queries

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_runs_and_returns_rows(spark, name):
    df = all_queries()[name](spark, SF)
    rows = df.limit(5000).collect()
    # near-dup pair queries may legitimately return 0 rows on this data
    if name not in ("embedding_near_dup_pairs", "minhash_lsh_pairs"):
        assert len(rows) > 0, name
    assert df.columns  # stable schema


def test_oracle_names_subset_of_queries():
    assert set(all_oracles()) <= set(all_queries())


def test_dedup_exact_finds_injected_duplicates(spark):
    import pandas as pd

    from unipdf_spark.operators import dedup

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["same text", "same text", "other", "same text"],
            }
        )
    )
    df.createOrReplaceTempView("_docs_tmp")
    # reuse operator logic by monkey-direct call on a fake sf_dir via temp view
    from pyspark.sql import functions as F

    h = df.select("doc_id", F.md5("text").alias("h"))
    g = h.groupBy("h").agg(F.min("doc_id").alias("canon"), F.count("*").alias("n"))
    out = {r["h"]: (r["canon"], r["n"]) for r in g.collect()}
    assert sorted(out.values()) == [(1, 3), (3, 1)]


def test_minhash_similar_docs_collide(spark):
    """Two near-identical docs must share LSH buckets; a disjoint doc not."""
    import pandas as pd
    from pyspark.sql import functions as F

    from unipdf_spark.operators.dedup import BAND_SIZE, N_HASHES, _shingles

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("kappa", "kappa2", 1)
    other = "completely different words with zero overlap whatsoever " * 5
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, other]})
    )
    sh = df.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    ).withColumn("sh64", F.xxhash64("shingle"))
    aggs = [
        F.min(F.xxhash64(F.col("sh64"), F.lit(i))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs).collect()
    sigs = {r["doc_id"]: [r[f"h{i}"] for i in range(N_HASHES)] for r in sig}
    agree_near = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    agree_other = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree_near > N_HASHES * 0.5
    assert agree_other < N_HASHES * 0.2
    # banding: near pair shares at least one full band
    bands_1 = [tuple(sigs[1][b * BAND_SIZE : (b + 1) * BAND_SIZE]) for b in range(N_HASHES // BAND_SIZE)]
    bands_2 = [tuple(sigs[2][b * BAND_SIZE : (b + 1) * BAND_SIZE]) for b in range(N_HASHES // BAND_SIZE)]
    assert any(a == b for a, b in zip(bands_1, bands_2))


def test_ann_topk_sane(spark):
    from unipdf_spark.operators.similarity import TOP_K, ann_bruteforce_topk

    rows = ann_bruteforce_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == TOP_K
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.0 <= c <= 1.0 for c in cosines)


def test_ann_ivf_structure_and_recall(spark):
    from unipdf_spark.operators.similarity import (
        TOP_K,
        ann_bruteforce_topk,
        ann_ivf_topk,
    )

    ivf = ann_ivf_topk(spark, SF).collect()
    bf = ann_bruteforce_topk(spark, SF).collect()
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= TOP_K
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
    ivf_set = {(r["query_id"], r["cand_id"]) for r in ivf}
    bf_set = {(r["query_id"], r["cand_id"]) for r in bf}
    recall = len(ivf_set & bf_set) / len(bf_set)
    assert recall >= 0.3, recall  # random vectors, nprobe=4/16
