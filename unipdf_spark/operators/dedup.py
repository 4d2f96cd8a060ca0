"""Deduplication operator family over `documents` — exact, fingerprint,
MinHash+LSH, SimHash, n-gram Jaccard.

Spark-first shapes that survive 100 TB:

* exact/fingerprint dedup — hash + groupBy (one shuffle on the hash key,
  map-side partial agg; canonical pick is min(doc_id), associative);
* MinHash — explode(shingles) → per-doc min of k hash families (single
  shuffle on doc_id, partial min map-side); LSH banding turns O(n²) pair
  search into a groupBy on band keys — only co-bucketed docs pair up;
* SimHash — 64 conditional-sum aggregates over exploded tokens, then
  16-bit-chunk blocking for Hamming≤k candidate pairs;
* verification joins stay on candidate pairs only (never cross join).

Exact/fingerprint have DuckDB oracles; MinHash/SimHash use engine hash
functions (xxhash64) with no portable SQL analog → rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_HASHES = 32
BAND_SIZE = 4  # 8 bands × 4 rows


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on raw text hash; canonical = min(doc_id) per group."""
    d = _docs(spark, sf_dir)
    h = d.select("doc_id", F.md5("text").alias("text_hash"))
    groups = h.groupBy("text_hash").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("group_size"),
    )
    return (
        h.join(groups, "text_hash")
        .select(
            "doc_id",
            "canonical_doc_id",
            "group_size",
            (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


DEDUP_EXACT_SQL = """
WITH h AS (SELECT doc_id, MD5(text) AS text_hash FROM documents),
g AS (SELECT text_hash, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS group_size
      FROM h GROUP BY text_hash)
SELECT doc_id, canonical_doc_id, group_size,
       doc_id = canonical_doc_id AS is_canonical
FROM h JOIN g USING (text_hash)
ORDER BY doc_id
"""


def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup after normalization (lowercase, strip punctuation,
    collapse whitespace) — catches trivially re-formatted duplicates."""
    d = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.regexp_replace("text", r"[^A-Za-z0-9\s]", " ")), r"\s+", " "
        )
    )
    h = d.select("doc_id", F.md5(norm).alias("norm_hash"))
    groups = h.groupBy("norm_hash").agg(
        F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("group_size")
    )
    return (
        h.join(groups, "norm_hash")
        .select("doc_id", "canonical_doc_id", "group_size")
        .orderBy("doc_id")
    )


DEDUP_NORM_SQL = """
WITH h AS (
    SELECT doc_id,
           MD5(TRIM(REGEXP_REPLACE(
               LOWER(REGEXP_REPLACE(text, '[^A-Za-z0-9\\s]', ' ', 'g')),
               '\\s+', ' ', 'g'))) AS norm_hash
    FROM documents
),
g AS (SELECT norm_hash, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS group_size
      FROM h GROUP BY norm_hash)
SELECT doc_id, canonical_doc_id, group_size
FROM h JOIN g USING (norm_hash)
ORDER BY doc_id
"""


def _shingles(col, n: int = 3):
    """Distinct word n-gram shingles from a text column."""
    toks = F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature (k=32 xxhash64 families over 3-gram
    shingles). Engine-specific hash → rows-only correctness check."""
    d = _docs(spark, sf_dir)
    sh = d.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs).orderBy("doc_id")


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing any (band, band-hash) bucket become candidate
    pairs; candidates are then verified with true shingle Jaccard. Only
    bucket-mates join — no cross product at any scale."""
    sig = minhash_signatures(spark, sf_dir)
    bands = []
    for b in range(N_HASHES // BAND_SIZE):
        cols = [F.col(f"h{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.xxhash64(*cols).alias("band_hash"),
            )
        )
    all_bands = bands[0]
    for b in bands[1:]:
        all_bands = all_bands.unionByName(b)
    a = all_bands.alias("a")
    bdf = all_bands.alias("b")
    cand = (
        a.join(
            bdf,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with true Jaccard over shingle sets
    d = _docs(spark, sf_dir).select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    j = (
        cand.join(d.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(d.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
    )
    return j.orderBy("doc_a", "doc_b")


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc: weighted bit votes of token hashes. Pure
    JVM-side expressions (bit ops + conditional sums over exploded tokens)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    ).withColumn("th", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sim = votes.select(
        "doc_id",
        sum(
            (F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**i))
            for i in range(63)
        ).alias("simhash"),
    )
    return sim.orderBy("doc_id")


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood n-gram Jaccard: block on the doc fingerprint
    prefix + compare adjacent doc_ids — a deterministic, SQL-expressible
    near-dup screen (oracle-checked)."""
    d = _docs(spark, sf_dir)
    toks = F.array_distinct(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    )
    t = d.select("doc_id", toks.alias("toks"))
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                F.size(F.array_intersect("a.toks", "b.toks"))
                / F.size(F.array_union("a.toks", "b.toks")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("doc_a")
    )


NGRAM_JACCARD_SQL = """
WITH t AS (
    SELECT doc_id,
           LIST_DISTINCT(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'),
                                     x -> x <> '')) AS toks
    FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(LEN(LIST_INTERSECT(a.toks, b.toks))::DOUBLE /
             LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))), 4) AS jaccard
FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
ORDER BY doc_a
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_normalized": dedup_normalized,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash_fingerprints": simhash_fingerprints,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_normalized": DEDUP_NORM_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    # minhash_*/simhash_*: engine-hash based → rows-only checks by design
}
