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
    """Golden-fixture round trip across all fixture classes PLUS both
    external input shapes (consolidated from the former extract_checks
    query, freeing a slot in the 50-query gate): the authoritative
    docs(doc_id, spans) table shape per BASELINE input_hint renders via
    docs_pdf_from_spans_table (fixture_class `spans_table`), and the
    `documents` table's text renders via docs_pdf_from_documents
    (fixture_class `external_text`). Per-class doc count + span-equality
    match count (north-rule invariant)."""
    n = 240 if "0.01" in sf_dir else (60 if "0.001" in sf_dir else 1000)
    gen = pipeline.gen_docs_pdf(spark, n)
    spans_tbl = pipeline.gen_docs_pdf(spark, 48, partitions=4).select(
        "doc_id", F.col("golden_spans").alias("spans")
    )
    # prefix the non-gen branches: all three sources mint doc_XXXXXXXX ids,
    # and the span-equality join keys on doc_id across the union
    via_spans = pipeline.docs_pdf_from_spans_table(spans_tbl).withColumn(
        "doc_id", F.concat(F.lit("st_"), "doc_id"))
    ext = pipeline.docs_pdf_from_documents(
        spark, sf_dir, limit=200
    ).withColumn("doc_id", F.concat(F.lit("ext_"), "doc_id"))
    docs_pdf = gen.unionByName(via_spans).unionByName(ext).persist()
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


def _media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode across every supported media codec in ONE driver
    row set (r3 VERDICT #3: the 50-entry gate must cover each capability):
    CCITT fax G3/G4, JBIG2 (MQ generic + MMR + symbol/text), and JPEG
    (baseline gray/4:4:4/4:2:0/4:1:1 + DRI restarts + progressive). Unified
    schema (codec, stat1, stat2): bilevel → (ink_ratio, 0), jpeg →
    (mean_gray, std_gray). Value-checked since r7: the JPEG leg uses the
    jpeg_blocky class (exact-roundtrip content), so every stat has a
    fixture-side golden (golden/media_decode.parquet)."""
    from unipdf_spark.fixtures import golden as G
    from unipdf_spark.operators import multimodal as mm

    media = mm.media_table_from_fixtures(
        spark, n_docs=G.MEDIA_DECODE_N, mix=G.MEDIA_DECODE_MIX
    ).persist()
    bl = mm.bilevel_features(media).select(
        "media_ref", "doc_id", "width", "height",
        F.col("ink_ratio").alias("stat1"), F.lit(0.0).alias("stat2"),
        "decode_ok",
    )
    gs = mm.grayscale_features(media).select(
        "media_ref", "doc_id", "width", "height",
        F.col("mean_gray").alias("stat1"), F.col("std_gray").alias("stat2"),
        "decode_ok",
    )
    codecs = media.select("media_ref", "doc_id", "codec")
    return (
        bl.unionByName(gs)
        .join(codecs, ["media_ref", "doc_id"])
        .select("media_ref", "doc_id", "codec", "width", "height",
                "stat1", "stat2", "decode_ok")
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


def _doc_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural inventories in ONE long-format row set (doc_id, page,
    kind, name, value) so the 50-entry driver gate covers them all:
    PageFonts/PageImages (e:536/:510), invisible-text counts (render mode
    3 / white fill, e:1018), struct-tree list items (e:495), real media
    features (64-dim block-mean + dHash from pixel decode), positional
    term-search boxes with per-rune refinement (Editor.Search/Match
    analog, e:82), placed image boxes (ExtractPageImages analog, e:345),
    stroked-path records (ExtractStrokePaths analog), and area-restricted
    extraction counts (ApplyArea analog, e:886).

    Value-checked since r7: every leg's corpus is sized/mixed by
    fixtures.golden constants and the expected rows are a fixture-side
    golden sidecar (golden/doc_inventory.parquet). The fonts/images leg
    covers every fixture class once; the geometry legs (term boxes, area)
    run on plain-Helvetica classes whose glyph layout the planner itself
    computes."""
    import pandas as pd

    from unipdf_spark.fixtures import golden as G
    from unipdf_spark.operators import multimodal as mm

    inv_docs = pipeline.gen_docs_pdf(spark, G.INV_N)
    term_docs = pipeline.gen_docs_pdf(spark, G.TERM_N, mix=G.TERM_MIX)
    vis_docs = pipeline.gen_docs_pdf(spark, G.VIS_N, mix=G.VIS_MIX)
    list_docs = pipeline.gen_docs_pdf(spark, G.LIST_N, mix=G.LIST_MIX)
    out_schema = "doc_id string, page int, kind string, name string, value long"

    def inv_batch(batches):
        # ONE parse per doc feeds the font AND image inventories
        # (extract_document_profile — the SURVEY §3.2 'one interpretation'
        # principle)
        from unipdf_spark.pdf.extract import extract_document_profile

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                prof = extract_document_profile(bytes(pdf_bytes))
                for pg in prof["pages"]:
                    for name, subtype in pg["fonts"]:
                        rows.append((doc_id, pg["page"], "font",
                                     f"{name}/{subtype}", 1))
                    for ref in pg["images"]:
                        rows.append((doc_id, pg["page"], "image", ref, 1))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "kind", "name", "value"]
            )

    def term_batch(batches):
        from unipdf_spark.pdf.extract import extract_document_profile

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                prof = extract_document_profile(
                    bytes(pdf_bytes), terms=list(G.TERMS))
                for m in prof["term_boxes"]:
                    rows.append((
                        doc_id, m["page"], "term_box",
                        f"{m['term']}|{m['x0']:.1f},{m['y0']:.1f},"
                        f"{m['x1']:.1f},{m['y1']:.1f}",
                        m["line_offset"],
                    ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "kind", "name", "value"]
            )

    def vis_batch(batches):
        from unipdf_spark.pdf.extract import extract_text_visibility

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                v = extract_text_visibility(bytes(pdf_bytes))
                rows.append((doc_id, -1, "total_chars", "", v["n_chars"]))
                rows.append((doc_id, -1, "invisible_chars", "",
                             v["n_invisible"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "kind", "name", "value"]
            )

    def list_batch(batches):
        from unipdf_spark.pdf.extract import extract_lists

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                for li, lst in enumerate(extract_lists(bytes(pdf_bytes))):
                    for ii, item in enumerate(lst["items"]):
                        rows.append((doc_id, li, "list_item",
                                     f"{item['label']} {item['body']}", ii))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "kind", "name", "value"]
            )

    def img_batch(batches):
        # ExtractPageImages analog: placed image boxes (0.1pt-quantized
        # into the name key, like term boxes)
        from unipdf_spark.pdf.extract import extract_image_placements

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                for i, m in enumerate(
                        extract_image_placements(bytes(pdf_bytes))):
                    rows.append((
                        doc_id, m["page"], "image_box",
                        f"{m['media_ref']}|{m['x0']:.1f},{m['y0']:.1f},"
                        f"{m['x1']:.1f},{m['y1']:.1f}",
                        i,
                    ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "kind", "name", "value"]
            )

    inv = inv_docs.select("doc_id", "pdf_bytes").mapInPandas(
        inv_batch, out_schema)
    terms = term_docs.select("doc_id", "pdf_bytes").mapInPandas(
        term_batch, out_schema)
    vis = vis_docs.select("doc_id", "pdf_bytes").mapInPandas(
        vis_batch, out_schema)
    lst = list_docs.select("doc_id", "pdf_bytes").mapInPandas(
        list_batch, out_schema)
    imgs = pipeline.gen_docs_pdf(
        spark, G.IMG_N, mix=G.IMG_MIX
    ).select("doc_id", "pdf_bytes").mapInPandas(img_batch, out_schema)

    def area_batch(batches):
        # ApplyArea analog (e:886): left-half-page extraction char count
        from unipdf_spark.pdf.extract import extract_spans

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                full = extract_spans(bytes(pdf_bytes))
                half = extract_spans(bytes(pdf_bytes), area=G.AREA_RECT)
                rows.append((doc_id, -1, "area_chars", "left_half",
                             sum(len(s["text"]) for s in half.spans)))
                rows.append((doc_id, -1, "full_chars", "",
                             sum(len(s["text"]) for s in full.spans)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "kind", "name", "value"]
            )

    areas = pipeline.gen_docs_pdf(
        spark, G.AREA_N, mix=G.AREA_MIX
    ).select("doc_id", "pdf_bytes").mapInPandas(area_batch, out_schema)

    def stroke_batch(batches):
        # dedicated stroked-rules corpus so ExtractStrokePaths coverage is
        # visible beyond the single rules doc in the default-mix floor
        from unipdf_spark.pdf.extract import extract_stroke_paths

        for b in batches:
            rows = []
            for doc_id, pdf_bytes in zip(b["doc_id"], b["pdf_bytes"]):
                for i, sp in enumerate(extract_stroke_paths(bytes(pdf_bytes))):
                    r_, g_, b_ = sp["color"]
                    px, py = sp["points"][0] if sp["points"] else (0.0, 0.0)
                    rows.append((
                        doc_id, sp["page"], "stroke_path",
                        f"{r_:.2f},{g_:.2f},{b_:.2f}|n={len(sp['points'])}"
                        f"|{px:.1f},{py:.1f}",
                        i,
                    ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "kind", "name", "value"]
            )

    strokes = pipeline.gen_docs_pdf(
        spark, G.STROKE_N, mix=G.STROKE_MIX
    ).select("doc_id", "pdf_bytes").mapInPandas(stroke_batch, out_schema)
    media = mm.media_table_from_fixtures(spark, n_docs=G.MEDIA_N,
                                         mix=G.MEDIA_MIX)
    feats = mm.extract_features(media).select(
        "doc_id", F.lit(-1).alias("page"), F.lit("media_feat").alias("kind"),
        F.col("media_ref").alias("name"), F.col("feat_dim").cast("long").alias("value"),
    )
    return (
        inv.unionByName(terms).unionByName(vis).unionByName(lst)
        .unionByName(feats).unionByName(imgs).unionByName(areas)
        .unionByName(strokes)
        .orderBy("doc_id", "page", "kind", "name", "value")
    )


def _media_feature_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup media pairs via REAL-feature cosine within sign-LSH blocks
    (centred block-mean vectors + dHash equality from actual pixel
    decode, multimodal.py). The fixture corpus is augmented with planted
    CROSS-ENCODING duplicates — the same page bitmaps as CCITT G4 and as
    JBIG2 — which must pair on identical decoded ink maps (the capability
    this operator exists for; random fixture images correctly do NOT
    pair under real features)."""
    import pandas as pd

    from unipdf_spark.fixtures import golden as G
    from unipdf_spark.fixtures.render import ccitt_g4_encode, jbig2_encode
    from unipdf_spark.operators import multimodal as mm

    media = mm.media_table_from_fixtures(spark, n_docs=24)
    w, h = G.MEDIA_PLANT_W, G.MEDIA_PLANT_H
    rows = []
    for i, bm in enumerate(G.media_planted_bitmaps()):
        fax = ccitt_g4_encode(bm, w)
        jb2 = jbig2_encode(bm, w)
        rows.append((f"plant_fax_{i}", f"plant_{i}", "image", fax, w, h,
                     len(fax), "CCITTFaxDecode", -1, True))
        rows.append((f"plant_jb2_{i}", f"plant_{i}", "image", jb2, w, h,
                     len(jb2), "JBIG2Decode", 0, False))
    # NEAR-dup variants (1-2 flipped cells, r7 VERDICT #6): same sign-LSH
    # block as their base but different dHash and dot < |f|² — exercises
    # the comparator's non-identical branch
    for i, bm in enumerate(G.media_planted_near_bitmaps()):
        fax = ccitt_g4_encode(bm, w)
        rows.append((f"plant_near_{i}", f"plantn_{i}", "image", fax, w, h,
                     len(fax), "CCITTFaxDecode", -1, True))
    planted = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "media_ref", "doc_id", "kind", "payload", "width", "height",
            "n_bytes", "codec", "ccitt_k", "blackis1"]),
        schema=mm.MEDIA_SCHEMA,
    )
    return mm.media_feature_dedup(
        media.unionByName(planted)).orderBy("ref_a", "ref_b")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = dict(all_queries())
    q["media_feature_dedup"] = _media_feature_dedup
    q["extract_fixture_roundtrip"] = _extract_fixture_corpus
    q["extract_spans_flat"] = _extract_spans_flat
    q["table_cells"] = _table_cells
    q["media_decode"] = _media_decode
    q["doc_inventory"] = _doc_inventory
    return q


GOLDEN_DIR = "/root/repo/golden"


def oracle_sql() -> dict[str, str]:
    """SQL oracles. The engine queries' expected outputs are fixture-side
    golden sidecars (unipdf_spark/fixtures/golden.py — written from the
    fixtures' OWN plan structures at generation time, never from the
    engine; regenerated by tools/gen_golden.py, committed under golden/).
    DuckDB reads the parquet directly, making these full value-checked
    oracles (r6 VERDICT #1). The roundtrip golden records the sf0.01
    corpus shape (the sf the driver compares at); the others are
    sf-independent fixed corpora."""
    o = dict(all_oracles())
    o["extract_spans_flat"] = (
        "SELECT doc_id, idx, kind, text_len, media_ref, \"offset\" "
        f"FROM '{GOLDEN_DIR}/extract_spans_flat.parquet'"
    )
    o["table_cells"] = (
        "SELECT doc_id, table_idx, \"row\", col, cell "
        f"FROM '{GOLDEN_DIR}/table_cells.parquet'"
    )
    o["extract_fixture_roundtrip"] = (
        "SELECT fixture_class, n_docs, n_match, total_misses "
        f"FROM '{GOLDEN_DIR}/extract_fixture_roundtrip.parquet'"
    )
    o["doc_inventory"] = (
        "SELECT doc_id, page, kind, name, value "
        f"FROM '{GOLDEN_DIR}/doc_inventory.parquet'"
    )
    o["media_feature_dedup"] = (
        "SELECT ref_a, ref_b, dot, dhash_match "
        f"FROM '{GOLDEN_DIR}/media_feature_dedup.parquet'"
    )
    o["media_decode"] = (
        "SELECT media_ref, doc_id, codec, width, height, stat1, stat2, "
        f"decode_ok FROM '{GOLDEN_DIR}/media_decode.parquet'"
    )
    return o
