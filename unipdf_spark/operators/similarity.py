"""Similarity search over the `embeddings` table (array<float> vectors).

* brute-force cosine top-k — the correctness baseline, expressed with
  JVM-side `aggregate`/`zip_with` (no Python in the loop); the small query
  set is broadcast so the candidate side never shuffles;
* LSH-bucketed variant (random-hyperplane signs via deterministic per-dim
  hash weights) — the scale path: at 10^9 vectors only same-bucket
  candidates are scored;
* embedding near-duplicate pairs (cosine ≥ τ on a label-blocked join).

Cosine is computed in double with identical element order on both engines so
ROUND(·, 6) hashes identically against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TOP_K = 5
N_QUERIES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a fixed query set (vec_id < N_QUERIES) against
    the rest. Queries are broadcast — one scan of the candidate side, no
    shuffle until the tiny per-query top-k aggregation."""
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "cand_id",
        F.round(_cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


ANN_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
           WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS cand_id, embedding AS c_emb FROM embeddings
      WHERE vec_id >= {N_QUERIES}),
scored AS (
    SELECT query_id, cand_id,
           ROUND(LIST_DOT_PRODUCT(LIST_TRANSFORM(q_emb, x -> x::DOUBLE),
                                  LIST_TRANSFORM(c_emb, x -> x::DOUBLE)) /
                 (SQRT(LIST_DOT_PRODUCT(LIST_TRANSFORM(q_emb, x -> x::DOUBLE),
                                        LIST_TRANSFORM(q_emb, x -> x::DOUBLE))) *
                  SQRT(LIST_DOT_PRODUCT(LIST_TRANSFORM(c_emb, x -> x::DOUBLE),
                                        LIST_TRANSFORM(c_emb, x -> x::DOUBLE)))), 6) AS cosine
    FROM q CROSS JOIN c
)
SELECT query_id, cand_id, cosine, rank
FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM scored)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (scale path): 12-bit random-hyperplane signature;
    query/candidate pairs are scored only within matching buckets. Recall <1
    by construction — returned as (query_id, cand_id, cosine, rank) over the
    bucketed candidates. Engine-hash based → rows-only check."""
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    dim = 64
    n_bits = 12

    # deterministic pseudo-random hyperplanes: weight(b, d) from xxhash64
    def signature(emb_col):
        bits = []
        for b in range(n_bits):
            w = F.aggregate(
                F.zip_with(
                    emb_col,
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda x, i: x.cast("double")
                    * (
                        (
                            F.xxhash64(
                                F.concat_ws("_", F.lit(str(b)), i.cast("string"))
                            )
                            % 1000
                        ).cast("double")
                        / 500.0
                        - 1.0
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(w > 0, F.lit(1 << b)).otherwise(F.lit(0)))
        return sum(bits[1:], bits[0])

    sig = e.select("vec_id", "embedding", signature(F.col("embedding")).alias("sig"))
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sig").alias("q_sig"),
    )
    c = sig.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("sig").alias("c_sig"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_sig") == F.col("c_sig"))
        .select(
            "query_id",
            "cand_id",
            F.round(_cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (scale path #2): a k-means coarse quantizer trained on a
    bounded driver-side sample assigns every vector to a cluster; queries
    probe only the nprobe nearest clusters, so the scored candidate set is
    ~nprobe/k of the corpus. At 10^9 vectors the assignment and scoring
    stages are the same Arrow-batched numpy; only the (tiny) codebook is
    driver-side. Engine-specific fit → rows-only check."""
    import numpy as np
    import pandas as pd

    k, nprobe, iters = 16, 4, 5
    e = _emb(spark, sf_dir)

    # train the codebook on a bounded sample (standard IVF practice)
    sample = np.stack(
        e.select("embedding").limit(2048).toPandas()["embedding"].to_numpy()
    ).astype("float64")
    rng_idx = [(i * 2654435761) % len(sample) for i in range(k)]
    cent = sample[rng_idx].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    cent_list = [[float(x) for x in row] for row in cent]
    bc = spark.sparkContext.broadcast(cent_list)

    def assign_batch(batches):
        c = np.asarray(bc.value)
        for b in batches:
            m = np.stack(b["embedding"].to_numpy()).astype("float64")
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": b["vec_id"],
                    "embedding": b["embedding"],
                    "cluster": order[:, 0],
                    "probes": [list(map(int, o[:nprobe])) for o in order],
                }
            )

    assigned = e.select("vec_id", "embedding").mapInPandas(
        assign_batch,
        "vec_id long, embedding array<float>, cluster int, probes array<int>",
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode("probes").alias("cluster"),
    )
    c = assigned.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"),
        "cluster",
    )
    from pyspark.sql.window import Window

    scored = (
        F.broadcast(q)
        .join(c, "cluster")
        .select(
            "query_id", "cand_id",
            F.round(_cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vector pairs: label-blocked join (same label only),
    cosine ≥ 0.95. Blocking keeps the pair space linear-ish; at 10^9 rows the
    block key would be an LSH bucket instead of the label. Self-dot norms are
    computed once per row BEFORE the join (O(n) not O(pairs)); the pairwise
    work is a single dot product."""
    e = _emb(spark, sf_dir)

    def find_pairs(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        norms = np.sqrt((m * m).sum(axis=1))
        sims = (m @ m.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(ids), k=1)
        cos = np.round(sims[iu], 6)
        mask = cos >= 0.95
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a, b),
                "vec_b": np.maximum(a, b),
                "cosine": cos[mask],
            }
        )

    # Arrow-batched numpy matmul per block — ~64× fewer flops through the
    # interpreter than per-pair higher-order-function dots (UDF guideline:
    # when built-ins can't express it efficiently, vectorized pandas UDF).
    return (
        e.groupBy("label")
        .applyInPandas(find_pairs, "vec_a long, vec_b long, cosine double")
        .orderBy("vec_a", "vec_b")
    )


NEAR_DUP_SQL = """
WITH d AS (SELECT vec_id, label,
                  LIST_TRANSFORM(embedding, x -> x::DOUBLE) AS emb
           FROM embeddings),
p AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(LIST_DOT_PRODUCT(a.emb, b.emb) /
                 (SQRT(LIST_DOT_PRODUCT(a.emb, a.emb)) *
                  SQRT(LIST_DOT_PRODUCT(b.emb, b.emb))), 6) AS cosine
    FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.95
ORDER BY vec_a, vec_b
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid via element-wise array aggregation (posexplode +
    groupBy) — the building block of IVF coarse quantization."""
    e = _emb(spark, sf_dir)
    x = e.select("label", F.posexplode("embedding").alias("dim", "val"))
    return (
        x.groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("mean_val"))
        .filter(F.col("dim") < 8)  # first 8 dims keep result compact
        .orderBy("label", "dim")
    )


CENTROID_SQL = """
SELECT label, (i - 1)::INT AS dim,
       ROUND(AVG(embedding[i]::DOUBLE), 6) AS mean_val
FROM embeddings, RANGE(1, 9) t(i)
GROUP BY label, dim
ORDER BY label, dim
"""


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "label_centroids": label_centroids,
}

ORACLES = {
    "ann_bruteforce_topk": ANN_SQL,
    "embedding_near_dup_pairs": NEAR_DUP_SQL,
    "label_centroids": CENTROID_SQL,
    # ann_lsh_topk: engine-hash bucketing → rows-only check
}
