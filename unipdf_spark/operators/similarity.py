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

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from . import phash

TOP_K = 5
N_QUERIES = 8
DIM = 64
N_BITS = 12

# deterministic hyperplane weights, identical Python-float literals inlined
# into both engines' plans (multiples of 0.002 — exactly representable)
_W = [
    [phash.hyperplane_weight(b * DIM + d) for d in range(DIM)]
    for b in range(N_BITS)
]


def _lsh_sig(emb_col: Column) -> Column:
    """12-bit random-hyperplane signature (Spark side): one zip_with fold per
    bit against that bit's 64-literal weight array. (A single-pass 12-wide
    accumulator was tried and is SLOWER here: dynamic element_at into a
    768-literal array per element×bit dominates; per-bit folds keep each
    weight array a constant local.) Add order per bit is d = 0..63,
    matching DuckDB's LIST_DOT_PRODUCT."""
    bits = []
    for b in range(N_BITS):
        w = F.aggregate(
            F.zip_with(
                emb_col,
                F.array(*[F.lit(x) for x in _W[b]]),
                lambda x, wv: x.cast("double") * wv,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(w > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0])


def _lsh_sig_sql(emb_expr: str) -> str:
    """The identical signature in DuckDB SQL (emb_expr: DOUBLE[] expression)."""
    terms = []
    for b in range(N_BITS):
        ws = ", ".join(repr(x) for x in _W[b])
        terms.append(
            f"(CASE WHEN LIST_DOT_PRODUCT({emb_expr}, [{ws}]) > 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return phash.spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), spark)


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
    """LSH-bucketed ANN (scale path): 12-bit portable random-hyperplane
    signature; query/candidate pairs are scored only within matching buckets.
    Recall <1 by construction (see ann_lsh_recall). The signature arithmetic
    is engine-portable → fully oracle-checked."""
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    sig = e.select("vec_id", "embedding", _lsh_sig(F.col("embedding")).alias("sig"))
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


ANN_LSH_SQL = f"""
WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> x::DOUBLE) AS emb
           FROM embeddings),
s AS (SELECT vec_id, emb, {_lsh_sig_sql('emb')} AS sig FROM e),
q AS (SELECT vec_id AS query_id, emb AS q_emb, sig FROM s
      WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS cand_id, emb AS c_emb, sig FROM s
      WHERE vec_id >= {N_QUERIES}),
scored AS (
    SELECT query_id, cand_id,
           ROUND(LIST_DOT_PRODUCT(q_emb, c_emb) /
                 (SQRT(LIST_DOT_PRODUCT(q_emb, q_emb)) *
                  SQRT(LIST_DOT_PRODUCT(c_emb, c_emb))), 6) AS cosine
    FROM q JOIN c USING (sig)
)
SELECT query_id, cand_id, cosine, rank
FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM scored)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the LSH scale path vs the exact bruteforce baseline,
    per query — quantifies what bucketing gives up (VERDICT: a scale path
    without a recall number is unquantified)."""
    bf = ann_bruteforce_topk(spark, sf_dir).select("query_id", "cand_id")
    ls = (
        ann_lsh_topk(spark, sf_dir)
        .select("query_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(ls, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(TOP_K), 4
            ).alias("recall_at_k")
        )
        .orderBy("query_id")
    )


ANN_LSH_RECALL_SQL = f"""
SELECT b.query_id,
       ROUND(SUM(CASE WHEN l.cand_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / {TOP_K}, 4) AS recall_at_k
FROM ({ANN_SQL}) b
LEFT JOIN ({ANN_LSH_SQL}) l
  ON b.query_id = l.query_id AND b.cand_id = l.cand_id
GROUP BY b.query_id
ORDER BY b.query_id
"""


def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the IVF scale path vs the exact bruteforce baseline,
    per query (rows-only: the codebook comes from a driver-side k-means
    fit, so no SQL analog — the recall floor is asserted in tests)."""
    bf = ann_bruteforce_topk(spark, sf_dir).select("query_id", "cand_id")
    iv = (
        ann_ivf_topk(spark, sf_dir)
        .select("query_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(iv, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(TOP_K), 4
            ).alias("recall_at_k")
        )
        .orderBy("query_id")
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
    """Near-duplicate vector pairs: LSH-signature-blocked (near-identical
    vectors share all hyperplane signs), cosine ≥ 0.95 within a block.
    Blocking on the 12-bit signature instead of a data column (label) keeps
    block cardinality ~n/4096 regardless of label skew — a hot label no
    longer creates an O(n²) pandas group. The per-block work is one numpy
    matmul (Arrow-batched)."""
    e = _emb(spark, sf_dir).withColumn("sig", _lsh_sig(F.col("embedding")))

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
        e.groupBy("sig")
        .applyInPandas(find_pairs, "vec_a long, vec_b long, cosine double")
        .orderBy("vec_a", "vec_b")
    )


NEAR_DUP_SQL = f"""
WITH d0 AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> x::DOUBLE) AS emb
            FROM embeddings),
d AS (SELECT vec_id, emb, {_lsh_sig_sql('emb')} AS sig FROM d0),
p AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(LIST_DOT_PRODUCT(a.emb, b.emb) /
                 (SQRT(LIST_DOT_PRODUCT(a.emb, a.emb)) *
                  SQRT(LIST_DOT_PRODUCT(b.emb, b.emb))), 6) AS cosine
    FROM d a JOIN d b ON a.sig = b.sig AND a.vec_id < b.vec_id
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
    "ann_lsh_recall": ann_lsh_recall,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_recall": ann_ivf_recall,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "label_centroids": label_centroids,
}

ORACLES = {
    "ann_bruteforce_topk": ANN_SQL,
    "ann_lsh_topk": ANN_LSH_SQL,
    "ann_lsh_recall": ANN_LSH_RECALL_SQL,
    "embedding_near_dup_pairs": NEAR_DUP_SQL,
    "label_centroids": CENTROID_SQL,
    # ann_ivf_topk / ann_ivf_recall: driver-side k-means fit → rows-only
}
