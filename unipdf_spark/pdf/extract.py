"""Top-level per-document extraction: pdf_bytes → interleaved spans.

Mirrors the lifecycle of ``extractor.New(page).ExtractPageText()``
(SURVEY §3.1; unipdf extractor/extractor.go:520 → :966) fused with the image
path (``ExtractPageImages``, e:698) into a single pass — one interpretation of
the operator stream yields text and media marks in operator order, then the
layout stage assembles reading-ordered spans.
"""

from __future__ import annotations

from dataclasses import dataclass

from .cos import PdfDocument, PdfError
from .interp import Interpreter
from .layout import assemble_spans


@dataclass
class ExtractResult:
    spans: list[dict]
    n_chars: int
    n_misses: int
    error: str | None = None


def _struct_tree_actual_text(doc: PdfDocument) -> dict[int, str]:
    """MCID → ActualText from the struct tree (StructTreeRoot,
    model/model.go:3710; consumed at extractor/extractor.go:977)."""
    out: dict[int, str] = {}
    try:
        cat = doc.catalog()
        root = doc.resolve(cat.get("StructTreeRoot"))
        if not isinstance(root, dict):
            return out

        def walk(node, depth=0):
            if depth > 64 or not isinstance(node, dict):
                return
            at = node.get("ActualText")
            k = doc.resolve(node.get("K"))
            if isinstance(k, (int, float)) and at is not None:
                txt = (
                    at.decode("utf-16-be")[1:]
                    if isinstance(at, bytes) and at.startswith(b"\xfe\xff")
                    else (at.decode("latin-1") if isinstance(at, bytes) else str(at))
                )
                out[int(k)] = txt
                return
            kids = k if isinstance(k, list) else [k]
            for kid in kids:
                kid = doc.resolve(kid)
                if isinstance(kid, dict):
                    walk(kid, depth + 1)
                elif isinstance(kid, (int, float)) and at is not None:
                    out[int(kid)] = str(at)

        walk(root)
    except PdfError:
        pass
    return out


def extract_spans(pdf_bytes: bytes, dehyphenate: bool = True) -> ExtractResult:
    """Extract the interleaved span sequence from a (possibly multi-page) PDF.

    Relaxed-mode philosophy (core ParserOpts core/core.go:389): per-document
    errors are reported in the result, never raised — at corpus scale one bad
    document must not fail a task (SURVEY §4)."""
    try:
        doc = PdfDocument(pdf_bytes, relaxed=True)
        pages = doc.pages()
        if not pages:
            return ExtractResult([], 0, 0, "no pages")
        mcid_at = _struct_tree_actual_text(doc)
        all_spans: list[dict] = []
        n_misses = 0
        offset_base = 0
        for page in pages:
            interp = Interpreter(doc, page, mcid_actual_text=mcid_at)
            interp.run()
            spans = assemble_spans(interp.marks, interp.media, dehyphenate,
                                   rulings=interp.rulings)
            for s in spans:
                s["offset"] += offset_base
            if spans:
                last_text = sum(len(s["text"]) for s in spans)
                offset_base += last_text
            all_spans.extend(spans)
            n_misses += interp.n_misses
        n_chars = sum(len(s["text"]) for s in all_spans)
        return ExtractResult(all_spans, n_chars, n_misses, None)
    except Exception as e:  # noqa: BLE001 — relaxed mode boundary
        return ExtractResult([], 0, 0, f"{type(e).__name__}: {e}")


def extract_tables(pdf_bytes: bytes) -> list[dict]:
    """Structured table extraction: the TextTable / TableCell API analog
    (extractor/extractor.go:35 `TextTable`, :899 `TableCell`). Returns one
    dict per detected table: {page, n_rows, n_cols, cells} with the full
    (row, col)-addressable cell-text matrix (empty string for empty cells),
    independent of the row-major serialization in the span stream."""
    out: list[dict] = []
    try:
        doc = PdfDocument(pdf_bytes, relaxed=True)
        for page_idx, page in enumerate(doc.pages()):
            interp = Interpreter(doc, page)
            interp.run()
            tables: list = []
            assemble_spans(interp.marks, interp.media, rulings=interp.rulings,
                           tables_out=tables)
            for t in tables:
                out.append(
                    {
                        "page": page_idx,
                        "n_rows": t.n_rows,
                        "n_cols": t.n_cols,
                        "cells": t.cells,
                    }
                )
    except Exception:  # noqa: BLE001 — relaxed mode boundary
        pass
    return out


def extract_text_visibility(pdf_bytes: bytes) -> dict:
    """Per-document invisible-text statistics from the per-mark paint
    metadata (fill color + render mode, extractor/extractor.go:1018):
    a mark is invisible when its render mode is 3 (no paint) or its fill
    is ~white on the (white) page. The span stream still INCLUDES invisible
    text (reference parity — PageText carries it); this feature column is
    what a training-data cleanup uses to drop white-on-white keyword spam."""
    n_chars = n_invisible = 0
    try:
        doc = PdfDocument(pdf_bytes, relaxed=True)
        for page in doc.pages():
            interp = Interpreter(doc, page)
            interp.run()
            for m in interp.marks:
                n = len(m.text)
                n_chars += n
                if m.render_mode == 3 or min(m.fill_rgb) >= 0.99:
                    n_invisible += n
    except Exception:  # noqa: BLE001 — relaxed mode boundary
        pass
    return {"n_chars": n_chars, "n_invisible": n_invisible}


def extract_page_inventory(pdf_bytes: bytes) -> list[dict]:
    """Per-page font and image inventories (PageFonts / PageImages,
    extractor/extractor.go:536/:510): one dict per page with the fonts used
    by shown text and the media refs placed on the page."""
    out: list[dict] = []
    try:
        doc = PdfDocument(pdf_bytes, relaxed=True)
        for page_idx, page in enumerate(doc.pages()):
            interp = Interpreter(doc, page)
            interp.run()
            out.append(
                {
                    "page": page_idx,
                    "fonts": sorted(interp.fonts_used),
                    "images": [m.media_ref for m in interp.media],
                }
            )
    except Exception:  # noqa: BLE001 — relaxed mode boundary
        pass
    return out


def _collect_mcids(doc: PdfDocument, node, depth: int = 0) -> list[int]:
    """All MCIDs under a struct element's /K (ints, MCR dicts, nested elems)."""
    if depth > 64:
        return []
    node = doc.resolve(node)
    if isinstance(node, (int, float)):
        return [int(node)]
    if isinstance(node, list):
        out: list[int] = []
        for kid in node:
            out.extend(_collect_mcids(doc, kid, depth + 1))
        return out
    if isinstance(node, dict):
        if str(node.get("Type") or "") == "MCR" and "MCID" in node:
            return [int(doc.resolve(node["MCID"]))]
        if "K" in node:
            return _collect_mcids(doc, node["K"], depth + 1)
    return []


def _struct_tree_lists(doc: PdfDocument) -> list[list[tuple[list[int], list[int]]]]:
    """Struct-tree /L list elements → [(label MCIDs, body MCIDs)] per list
    (PageText.List, extractor/extractor.go:495: L → LI → Lbl + LBody)."""
    lists: list[list[tuple[list[int], list[int]]]] = []
    try:
        root = doc.resolve(doc.catalog().get("StructTreeRoot"))
    except PdfError:
        return lists
    if not isinstance(root, dict):
        return lists

    def walk(node, depth: int = 0) -> None:
        if depth > 64:
            return
        node = doc.resolve(node)
        if isinstance(node, list):
            for kid in node:
                walk(kid, depth + 1)
            return
        if not isinstance(node, dict):
            return
        if str(node.get("S") or "") == "L":
            items: list[tuple[list[int], list[int]]] = []
            kids = doc.resolve(node.get("K"))
            for li in kids if isinstance(kids, list) else [kids]:
                li = doc.resolve(li)
                if not isinstance(li, dict) or str(li.get("S") or "") != "LI":
                    continue
                lbl: list[int] = []
                body: list[int] = []
                lk = doc.resolve(li.get("K"))
                for part in lk if isinstance(lk, list) else [lk]:
                    part = doc.resolve(part)
                    if not isinstance(part, dict):
                        continue
                    s = str(part.get("S") or "")
                    if s == "Lbl":
                        lbl.extend(_collect_mcids(doc, part.get("K")))
                    elif s == "LBody":
                        body.extend(_collect_mcids(doc, part.get("K")))
                if lbl or body:
                    items.append((lbl, body))
            if items:
                lists.append(items)
            return
        if "K" in node:
            walk(node["K"], depth + 1)

    walk(root)
    return lists


def extract_lists(pdf_bytes: bytes) -> list[dict]:
    """Structured list extraction (PageText.List, extractor/extractor.go:495):
    struct-tree L/LI/Lbl/LBody elements resolved to their marked-content
    text. Returns one dict per list: {items: [{label, body}]}. The span
    stream is unchanged (list text flows through reading order as usual).

    Scope note: MCIDs are resolved through one document-wide map; documents
    that REUSE mcid numbers on different pages would need /Pg-qualified
    resolution (the reference's ParentTree is per page) — not yet wired."""
    out: list[dict] = []
    try:
        doc = PdfDocument(pdf_bytes, relaxed=True)
        lists = _struct_tree_lists(doc)
        if not lists:
            return out
        mcid_text: dict[int, str] = {}
        for page in doc.pages():
            interp = Interpreter(doc, page)
            interp.run(include_annotations=False)
            for m in sorted(interp.marks, key=lambda m: m.op_index):
                if m.mcid >= 0:
                    mcid_text[m.mcid] = mcid_text.get(m.mcid, "") + m.text

        def text_of(mcids: list[int]) -> str:
            return "".join(mcid_text.get(i, "") for i in mcids).strip()

        for items in lists:
            out.append(
                {
                    "items": [
                        {"label": text_of(lbl), "body": text_of(body)}
                        for lbl, body in items
                    ]
                }
            )
    except Exception:  # noqa: BLE001 — relaxed mode boundary
        pass
    return out
