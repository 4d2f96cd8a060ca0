"""Multimodal column operators: image/audio/video as opaque `binary` columns
with typed metadata.

The Spark-side plumbing is real (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning); the codec step itself is stubbed behind
`_decode_image_stub` — the container has no image/audio libraries, and the
span pipeline needs media *identity*, not pixels (same stance as the
reference's text path, which skips image XObjects — extractor.go:1016 block).
A real deployment swaps the stub for Pillow/torchaudio inside the same UDFs.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_ref string, doc_id string, kind string, payload binary, "
    "width int, height int, n_bytes int, codec string, ccitt_k int, "
    "blackis1 boolean"
)

FEATURE_SCHEMA = (
    "media_ref string, doc_id string, feature array<float>, "
    "feat_dim int, decode_ok boolean"
)

THUMB_SCHEMA = (
    "media_ref string, thumb binary, thumb_w int, thumb_h int"
)

STUB_FEAT_DIM = 16


def media_table_from_fixtures(spark, n_docs: int = 60, mix="default") -> DataFrame:
    """Build a media table (one row per media span payload) from the fixture
    corpus — exercises the binary-column path end to end."""
    from .. import pipeline

    docs = pipeline.gen_docs_pdf(spark, n_docs, mix=mix, partitions=4)

    def emit_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..pdf.cos import PdfDocument, Stream

        for b in batches:
            rows = []
            for doc_id, pdf in zip(b["doc_id"], b["pdf_bytes"]):
                try:
                    doc = PdfDocument(bytes(pdf))
                except Exception:
                    continue
                for num in sorted(doc.xref):
                    try:
                        obj = doc.get_object(num)
                    except Exception:
                        continue
                    if not isinstance(obj, Stream):
                        continue
                    d = obj.dict
                    if d.get("Subtype") != "Image":
                        continue
                    ref = "img_" + hashlib.sha256(obj.raw).hexdigest()[:16]
                    w = int(doc.resolve(d.get("Width")) or 0)
                    h = int(doc.resolve(d.get("Height")) or 0)
                    filt = doc.resolve(d.get("Filter"))
                    codec = str(filt if not isinstance(filt, list)
                                else (filt[0] if filt else ""))
                    parms = doc.resolve(d.get("DecodeParms")) or {}
                    if not isinstance(parms, dict):
                        parms = {}
                    k = int(doc.resolve(parms.get("K", 0)) or 0)
                    b1 = bool(doc.resolve(parms.get("BlackIs1", False)))
                    rows.append(
                        (ref, doc_id, "image", obj.raw, w, h, len(obj.raw),
                         codec, k, b1)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "doc_id", "kind", "payload", "width",
                         "height", "n_bytes", "codec", "ccitt_k", "blackis1"],
            )

    return docs.mapInPandas(emit_media, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int):
    """STUB decode: deterministic fake pixel statistics derived from the
    payload hash — NOT a real codec. Replace with Pillow in deployment.
    Raises on empty payload to exercise the per-row error path."""
    if not payload:
        raise NotImplementedError("empty payload: no codec available (stub)")
    h = hashlib.sha256(payload).digest()
    # 16 deterministic pseudo-features in [0, 1)
    feats = [
        struct.unpack(">H", h[2 * i : 2 * i + 2])[0] / 65536.0
        for i in range(STUB_FEAT_DIM)
    ]
    return feats


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media payloads. Per-row
    failures land in `decode_ok=false` rows, never fail the task (relaxed
    philosophy, SURVEY §3.1)."""

    def feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            refs, dids, feats, dims, oks = [], [], [], [], []
            for ref, did, payload, w, h in zip(
                b["media_ref"], b["doc_id"], b["payload"], b["width"],
                b["height"],
            ):
                refs.append(ref)
                dids.append(did)
                try:
                    f = _decode_image_stub(bytes(payload or b""), int(w), int(h))
                    feats.append(f)
                    dims.append(len(f))
                    oks.append(True)
                except Exception:
                    feats.append([])
                    dims.append(0)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "doc_id": dids,
                    "feature": feats,
                    "feat_dim": dims,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(feat_batch, schema=FEATURE_SCHEMA)


def resize_thumbnails(media: DataFrame, max_side: int = 4) -> DataFrame:
    """Thumbnail 'resize' plumbing: batch shape + output schema are real;
    the pixel work is a deterministic byte-fold stub."""

    def thumb_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, payload, w, h in zip(
                b["media_ref"], b["payload"], b["width"], b["height"]
            ):
                p = bytes(payload or b"")
                tw = min(int(w) or max_side, max_side)
                th_ = min(int(h) or max_side, max_side)
                n = max(1, tw * th_ * 3)
                folded = bytes(
                    sum(p[i::n]) % 256 if p else 0 for i in range(min(n, len(p) or 1))
                )
                rows.append((ref, folded, tw, th_))
            yield pd.DataFrame(
                rows, columns=["media_ref", "thumb", "thumb_w", "thumb_h"]
            )

    return media.mapInPandas(thumb_batch, schema=THUMB_SCHEMA)


MEDIA_BLOCK_CAP = 64


def media_feature_dedup(media: DataFrame) -> DataFrame:
    """Near-dup media via stub-feature cosine within blocks.

    Blocking key = (feat_dim, 8-bit feature-sign LSH); blocks larger than
    MEDIA_BLOCK_CAP refine to the full 16-bit sign signature (same
    hierarchical device as embedding_near_dup_pairs — a degenerate
    all-identical-feature corpus can't force an n² join task). The join is
    an equality shuffle join on the block, never a cross product.
    """
    feats = extract_features(media).filter(F.col("decode_ok"))

    def sign_bits(n: int):
        return F.concat_ws(
            "",
            *[
                (F.element_at(F.col("feature"), i + 1) > 0)
                .cast("int").cast("string")
                for i in range(n)
            ],
        )

    feats = feats.withColumn(
        "b8", F.concat_ws(":", F.col("feat_dim").cast("string"), sign_bits(8))
    ).withColumn("b16", sign_bits(STUB_FEAT_DIM))
    from pyspark.sql.window import Window

    feats = feats.withColumn(
        "n8", F.count(F.lit(1)).over(Window.partitionBy("b8"))
    ).withColumn(
        "block",
        F.when(F.col("n8") <= MEDIA_BLOCK_CAP, F.col("b8"))
        .otherwise(F.concat_ws(":", F.col("b8"), F.col("b16"))),
    )
    a = feats.alias("a")
    b = feats.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.feature"), F.col("b.feature"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.media_ref") < F.col("b.media_ref")),
        )
        .select(
            F.col("a.media_ref").alias("ref_a"),
            F.col("b.media_ref").alias("ref_b"),
            F.round(dot, 6).alias("dot"),
        )
    )


BILEVEL_SCHEMA = (
    "media_ref string, doc_id string, width int, height int, "
    "ink_ratio double, decode_ok boolean"
)


def bilevel_features(media: DataFrame) -> DataFrame:
    """REAL pixel decode for bilevel (CCITT fax + JBIG2 generic-region)
    media — the scanned-document leg of the multimodal path (reference
    internal/ccittfax + internal/jbig2). Computes the ink ratio (fraction of
    black pixels) per image via the engine's decoders inside an
    Arrow-batched mapInPandas; other codecs keep the stub path
    (extract_features)."""

    def fax_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..pdf.ccitt import decode_ccitt
        from ..pdf.jbig2 import decode_jbig2_packed

        for b in batches:
            rows = []
            for ref, doc_id, payload, w, h, k, b1, codec in zip(
                b["media_ref"], b["doc_id"], b["payload"], b["width"],
                b["height"], b["ccitt_k"], b["blackis1"], b["codec"],
            ):
                try:
                    if codec == "JBIG2Decode":
                        # JBIG2 convention: 1 = black, always
                        bits, bw, bh = decode_jbig2_packed(
                            bytes(payload), int(w), int(h))
                        black_is_one, width = True, bw
                    else:
                        black_is_one = bool(b1)
                        width = int(w)
                        bits = decode_ccitt(
                            bytes(payload),
                            {"K": int(k), "Columns": width,
                             "BlackIs1": black_is_one},
                        )
                    stride = (width + 7) // 8
                    n_black = total = 0
                    for r in range(len(bits) // stride):
                        for x in range(width):
                            bit = (bits[r * stride + (x >> 3)]
                                   >> (7 - (x & 7))) & 1
                            # PDF CCITT default: 0 = black; /BlackIs1 (and
                            # JBIG2 foreground) invert
                            n_black += bit if black_is_one else (1 - bit)
                            total += 1
                    rows.append((ref, doc_id, int(w), int(h),
                                 round(n_black / max(total, 1), 6), True))
                except Exception:  # noqa: BLE001 — per-row error path
                    rows.append((ref, doc_id, int(w), int(h), 0.0, False))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "doc_id", "width", "height",
                         "ink_ratio", "decode_ok"],
            )

    return media.filter(
        F.col("codec").isin("CCITTFaxDecode", "JBIG2Decode")
    ).mapInPandas(fax_batch, schema=BILEVEL_SCHEMA)


GRAY_SCHEMA = (
    "media_ref string, doc_id string, width int, height int, "
    "mean_gray double, std_gray double, decode_ok boolean"
)


def grayscale_features(media: DataFrame) -> DataFrame:
    """REAL pixel decode for baseline-JPEG (DCTDecode) media — grayscale
    statistics per image via the engine's T.81 decoder (pdf/jpeg.py) inside
    an Arrow-batched mapInPandas. Non-baseline/color streams land in
    decode_ok=false rows (relaxed philosophy)."""

    def jpg_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..pdf.jpeg import decode_baseline_gray

        for b in batches:
            rows = []
            for ref, doc_id, payload, w, h in zip(
                b["media_ref"], b["doc_id"], b["payload"], b["width"],
                b["height"],
            ):
                try:
                    img = decode_baseline_gray(bytes(payload))
                    rows.append(
                        (ref, doc_id, int(w), int(h),
                         round(float(np.mean(img)), 4),
                         round(float(np.std(img)), 4), True)
                    )
                except Exception:  # noqa: BLE001 — per-row error path
                    rows.append((ref, doc_id, int(w), int(h), 0.0, 0.0, False))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "doc_id", "width", "height",
                         "mean_gray", "std_gray", "decode_ok"],
            )

    return media.filter(F.col("codec") == "DCTDecode").mapInPandas(
        jpg_batch, schema=GRAY_SCHEMA
    )
