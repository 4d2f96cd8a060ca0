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
    )


DEDUP_EXACT_SQL = """
WITH h AS (SELECT doc_id, MD5(text) AS text_hash FROM documents),
g AS (SELECT text_hash, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS group_size
      FROM h GROUP BY text_hash)
SELECT doc_id, canonical_doc_id, group_size,
       doc_id = canonical_doc_id AS is_canonical
FROM h JOIN g USING (text_hash)
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
    # hash each shingle string once, then derive the k families as cheap
    # long+seed hashes — all WITHIN the row (array_min over transform):
    # no explode, no shuffle; identical values to the explode+min form
    sh64 = F.transform(_shingles(F.col("text")), lambda s: F.xxhash64(s))
    base = d.select("doc_id", sh64.alias("sh64"))
    def _family(i: int):
        # NB: a two-parameter lambda would be taken as Spark's
        # (element, index) form and silently drop the family seed
        return lambda h: F.xxhash64(h, F.lit(i))

    sigs = [
        F.array_min(F.transform(F.col("sh64"), _family(i))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    # no orderBy: a global sort adds a range-partition SAMPLING pass that
    # recomputes this whole projection twice; the correctness check is
    # order-insensitive
    return base.select("doc_id", *sigs)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing any (band, band-hash) bucket become candidate
    pairs; candidates are then verified with true shingle Jaccard. Only
    bucket-mates join — no cross product at any scale."""
    sig = minhash_signatures(spark, sf_dir)
    # one pass: explode all 8 band keys from a single signature computation
    # (separate per-band projections would recompute the shingle aggregation
    # once per band), then bucket via collect_list — pairs are generated
    # INSIDE buckets, so the signature plan is never self-joined
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"h{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
            ).alias("band_hash"),
        )
        for b in range(N_HASHES // BAND_SIZE)
    ])
    band_tbl = sig.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"),
             F.col("bb.band_hash").alias("band_hash"))
    buckets = (
        band_tbl.groupBy("band", "band_hash")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    # verify candidates with true Jaccard over shingle sets — computed ONLY
    # for docs that appear in a candidate pair (semi-join before the shingle
    # expression: at corpus scale candidates ≪ corpus)
    pair_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    d = (
        _docs(spark, sf_dir)
        .join(F.broadcast(pair_ids), "doc_id", "left_semi")
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
    )
    j = (
        cand.join(F.broadcast(d.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a")), "doc_a")
        .join(F.broadcast(d.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b")), "doc_b")
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
    return j


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc: weighted bit votes of token hashes. Pure
    JVM-side expressions (bit ops + conditional sums over exploded tokens)."""
    d = _docs(spark, sf_dir)
    th = F.transform(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""),
        lambda t: F.xxhash64(t),
    )
    base = d.select("doc_id", th.alias("th"))

    def _bit_vote(i: int):
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(F.col("th"), F.lit(0), merge)

    # within-row bit votes (no explode/shuffle); final 63-bit fingerprint
    votes = base.select(
        "doc_id", *[(_bit_vote(i) > 0).cast("int").alias(f"b{i}") for i in range(63)]
    )
    return votes.select(
        "doc_id",
        sum((F.col(f"b{i}") * F.lit(2**i)) for i in range(63)).alias("simhash"),
    )


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
