"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: render the sf0.001 `documents` table's text into
real PDFs (distributed), run the span-extraction engine over them, and return
the per-doc verification frame (span-sequence equality vs golden).

``queries()`` — one entry per implemented operator (SURVEY §2 + the
training-data operator families); ``oracle_sql()`` — DuckDB equivalents where
SQL-expressible (extraction itself and engine-hash ops are rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from unipdf_spark import pipeline
from unipdf_spark.operators import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    docs_pdf = pipeline.docs_pdf_from_documents(
        spark, "/root/testdata/sf0.001", limit=100
    )
    docs_pdf = docs_pdf.persist()
    spans_out = pipeline.run_extraction(docs_pdf)
    return pipeline.span_equality(docs_pdf, spans_out)


# --- extraction-pipeline queries (non-SQL-expressible → rows-only checks) ----


def _extract_fixture_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-fixture round trip across all fixture classes: per-class
    doc count + span-equality match count (north-rule invariant)."""
    n = 240 if "0.01" in sf_dir else (60 if "0.001" in sf_dir else 1000)
    docs_pdf = pipeline.gen_docs_pdf(spark, n).persist()
    spans_out = pipeline.run_extraction(docs_pdf)
    eq = pipeline.span_equality(docs_pdf, spans_out)
    return (
        eq.groupBy("fixture_class")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("match").cast("int")).alias("n_match"),
            F.sum(F.col("n_misses")).alias("total_misses"),
        )
        .orderBy("fixture_class")
    )


def _extract_external_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction over PDFs rendered from the `documents` table text."""
    docs_pdf = pipeline.docs_pdf_from_documents(spark, sf_dir, limit=200).persist()
    spans_out = pipeline.run_extraction(docs_pdf)
    eq = pipeline.span_equality(docs_pdf, spans_out)
    return eq.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("match").cast("int")).alias("n_match"),
    )


def _extract_spans_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded span view (doc_id, idx, kind, text_len, media_ref, offset) of
    a deterministic 60-doc fixture corpus — exercises the full engine and the
    DataFrame-level explode/ordering path."""
    docs_pdf = pipeline.gen_docs_pdf(spark, 60)
    spans_out = pipeline.run_extraction(docs_pdf)
    return (
        spans_out.select("doc_id", F.posexplode("spans").alias("idx", "s"))
        .select(
            "doc_id",
            "idx",
            F.col("s.kind").alias("kind"),
            F.length("s.text").alias("text_len"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
        .orderBy("doc_id", "idx")
    )


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: media payloads from fixture PDFs → stub feature
    extraction (binary columns + Arrow batches; decode stubbed by design)."""
    from unipdf_spark.operators import multimodal as mm

    media = mm.media_table_from_fixtures(spark, n_docs=60)
    return (
        mm.extract_features(media)
        .select("media_ref", "doc_id", "feat_dim", "decode_ok")
        .orderBy("media_ref", "doc_id")
    )


def _fax_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real CCITT G4 pixel decode over fax fixture media (ink ratio per
    image) — the scanned-document leg of the multimodal path."""
    from unipdf_spark.operators import multimodal as mm

    media = mm.media_table_from_fixtures(spark, n_docs=30, mix=[("fax", 1)])
    return (
        mm.bilevel_features(media)
        .select("media_ref", "doc_id", "width", "height", "ink_ratio",
                "decode_ok")
        .orderBy("media_ref", "doc_id")
    )


def _jbig2_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JBIG2 generic-region pixel decode (MQ arithmetic + MMR legs)
    over jbig2 fixture media — ink ratio per image (internal/jbig2 parity
    subset; pdf/jbig2.py)."""
    from unipdf_spark.operators import multimodal as mm

    media = mm.media_table_from_fixtures(spark, n_docs=30, mix=[("jbig2", 1)])
    return (
        mm.bilevel_features(media)
        .select("media_ref", "doc_id", "width", "height", "ink_ratio",
                "decode_ok")
        .orderBy("media_ref", "doc_id")
    )


def _jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline-JPEG pixel decode over jpeg fixture media — grayscale
    mean/std per image (pdf/jpeg.py T.81 subset)."""
    from unipdf_spark.operators import multimodal as mm

    media = mm.media_table_from_fixtures(spark, n_docs=30, mix=[("jpeg", 1)])
    return (
        mm.grayscale_features(media)
        .select("media_ref", "doc_id", "width", "height", "mean_gray",
                "std_gray", "decode_ok")
        .orderBy("media_ref", "doc_id")
    )


def _table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTable/TableCell structured API (extractor.go:35/:899): every
    detected table's (row, col)-addressable cell matrix over a deterministic
    table-heavy fixture corpus (ruled grids + whitespace-aligned)."""
    docs_pdf = pipeline.gen_docs_pdf(
        spark, 40, mix=[("gridtable", 1), ("wstable", 1), ("twotables", 1)]
    )
    return pipeline.run_table_extraction(docs_pdf).orderBy(
        "doc_id", "table_idx", "row", "col"
    )


def _list_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-tree list extraction (PageText.List, e:495) lifted to rows:
    (doc_id, list_idx, item_idx, label, body)."""
    import pandas as pd

    docs_pdf = pipeline.gen_docs_pdf(
        spark, 30, mix=[("tagged_list", 1), ("tagged_pg", 1)]
    )

    def list_batch(batches):
        from unipdf_spark.pdf.extract import extract_lists

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                for li, lst in enumerate(extract_lists(bytes(pdf_bytes))):
                    for ii, item in enumerate(lst["items"]):
                        rows.append((doc_id, li, ii, item["label"],
                                     item["body"]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "list_idx", "item_idx", "label", "body"],
            )

    return (
        docs_pdf.select("doc_id", "pdf_bytes")
        .mapInPandas(
            list_batch,
            "doc_id string, list_idx int, item_idx int, label string, "
            "body string",
        )
        .orderBy("doc_id", "list_idx", "item_idx")
    )


def _text_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invisible-text feature column (render mode 3 / white-on-white fill,
    per-mark paint metadata e:1018) over a corpus containing keyword-spam
    docs — the training-data cleanup the span stream alone can't drive."""
    import pandas as pd

    docs_pdf = pipeline.gen_docs_pdf(
        spark, 30, mix=[("invisible", 1), ("simple", 1)]
    )

    def vis_batch(batches):
        from unipdf_spark.pdf.extract import extract_text_visibility

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                v = extract_text_visibility(bytes(pdf_bytes))
                rows.append((doc_id, v["n_chars"], v["n_invisible"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_chars", "n_invisible"]
            )

    return (
        docs_pdf.select("doc_id", "pdf_bytes")
        .mapInPandas(vis_batch, "doc_id string, n_chars long, n_invisible long")
        .orderBy("doc_id")
    )


def _page_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageFonts/PageImages inventories (e:536/:510) lifted to rows."""
    import pandas as pd

    docs_pdf = pipeline.gen_docs_pdf(spark, 40)

    def inv_batch(batches):
        from unipdf_spark.pdf.extract import extract_page_inventory

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                for pg in extract_page_inventory(bytes(pdf_bytes)):
                    for name, subtype in pg["fonts"]:
                        rows.append((doc_id, pg["page"], "font",
                                     f"{name}/{subtype}"))
                    for ref in pg["images"]:
                        rows.append((doc_id, pg["page"], "image", ref))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "kind", "name"]
            )

    return (
        docs_pdf.select("doc_id", "pdf_bytes")
        .mapInPandas(
            inv_batch, "doc_id string, page int, kind string, name string"
        )
        .orderBy("doc_id", "page", "kind", "name")
    )


def _extract_docs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule input shape end to end: docs(doc_id, spans) table →
    rendered PDFs → extraction → span equality vs the normalized golden."""
    docs = pipeline.gen_docs_pdf(spark, 48, partitions=4).select(
        "doc_id", F.col("golden_spans").alias("spans")
    )
    docs_pdf = pipeline.docs_pdf_from_spans_table(docs).persist()
    eq = pipeline.span_equality(docs_pdf, pipeline.run_extraction(docs_pdf))
    return eq.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("match").cast("int")).alias("n_match"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = dict(all_queries())
    q["extract_docs_table"] = _extract_docs_table
    q["extract_fixture_roundtrip"] = _extract_fixture_corpus
    q["extract_external_text"] = _extract_external_text
    q["extract_spans_flat"] = _extract_spans_flat
    q["table_cells"] = _table_cells
    q["fax_decode"] = _fax_decode
    q["jbig2_decode"] = _jbig2_decode
    q["jpeg_decode"] = _jpeg_decode
    q["list_items"] = _list_items
    q["text_visibility"] = _text_visibility
    q["page_inventory"] = _page_inventory
    q["media_features"] = _media_features
    return q


def oracle_sql() -> dict[str, str]:
    return dict(all_oracles())
