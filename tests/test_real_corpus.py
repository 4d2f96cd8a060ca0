"""Real-corpus ingest harness (r9 VERDICT #1): turnkey directory-of-files
→ per-doc outcome rows + report.

Two layers:
* always-on plumbing tests over a tmp directory the test populates with
  the repo's own fixture PDFs/HTML plus deliberately broken files — proves
  the harness is turnkey (binaryFile scan, magic sniff, error rows, report)
  without real-world bytes;
* a gated test (``UNIPDF_SPARK_REAL_CORPUS_DIR``, same pattern as the CMap
  data gate) that runs the moment a driver data drop lands and commits the
  report to ``BENCH/REAL_CORPUS.md`` — the repo proving itself against
  bytes it did not author.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest


def _populate(tmp: Path) -> dict[str, int]:
    """Write a mixed corpus: fixture PDFs (incl. one in a nested dir and
    one with a misleading extension), HTML, a truncated PDF, a bogus
    binary. Returns expected per-kind counts."""
    from unipdf_spark.fixtures.gen import make_doc, make_html_doc

    _, pdf_a = make_doc("corpus_a", "plain", seed=7)
    _, pdf_b = make_doc("corpus_b", "multicolumn", seed=7)
    _, pdf_c = make_doc("corpus_c", "interleaved", seed=7)
    (tmp / "a.pdf").write_bytes(pdf_a)
    (tmp / "nested").mkdir()
    (tmp / "nested" / "b.pdf").write_bytes(pdf_b)
    # magic must beat the extension: a PDF delivered as .bin
    (tmp / "c.bin").write_bytes(pdf_c)
    html = make_html_doc("corpus_h", "An article long enough to clear the "
                         "main-content length gate with room to spare. "
                         "It keeps going for a second sentence.")
    (tmp / "page.html").write_text(html)
    (tmp / "frag.htm").write_text("<p>short html fragment</p>")
    # damaged: header present but no recoverable objects at all → error
    # row, not raise (a 1/3-truncation is NOT enough: relaxed repair
    # legitimately recovers whole objects from the surviving prefix)
    (tmp / "broken.pdf").write_bytes(b"%PDF-1.7\n" + b"\x00" * 300)
    (tmp / "noise.dat").write_bytes(bytes(range(256)) * 4)
    # sniff-order locks (r9 ADVICE): an HTML page that MENTIONS %PDF-
    # early must stay html (root tags are checked first)...
    (tmp / "mentions.html").write_text(
        "<!doctype html><html><body><p>Serve files whose magic is %PDF-1.4"
        " via the viewer.</p><p>" + "Long enough body text. " * 20
        + "</p></body></html>")
    # ...and a PDF behind MORE transport junk than the parser's 1024-byte
    # header-rebase window is unknown, not a guaranteed-to-fail pdf row
    (tmp / "deepjunk.bin").write_bytes(b"#" * 1500 + pdf_a)
    return {"pdf": 4, "html": 3, "unknown": 2}


def test_corpus_ingest_turnkey(spark, tmp_path):
    from pyspark.sql import functions as F

    from unipdf_spark.real_corpus import (
        corpus_report, extract_corpus_spans, ingest_report, read_corpus_dir)

    expected = _populate(tmp_path)
    outcomes, report = ingest_report(spark, str(tmp_path))
    collected = outcomes.collect()
    # doc_id == full path in the outcomes table (same key as the spans
    # table, so the two join; basename ids collide across subdirectories)
    assert all(r["doc_id"] == r["path"] for r in collected)
    rows = {r["doc_id"].rsplit("/", 1)[-1]: r for r in collected}
    assert len(rows) == sum(expected.values())
    # kind sniff: recursion found nested/b.pdf; magic beat .bin's extension
    kinds = {d: r["kind"] for d, r in rows.items()}
    assert kinds["c.bin"] == "pdf" and kinds["b.pdf"] == "pdf"
    assert kinds["page.html"] == "html" and kinds["frag.htm"] == "html"
    assert kinds["noise.dat"] == "unknown"
    # sniff order: HTML root tags beat an early %PDF- mention; junk beyond
    # the parser's 1024-byte rebase window means NOT pdf
    assert kinds["mentions.html"] == "html"
    assert kinds["deepjunk.bin"] == "unknown"
    # intact PDFs extract; every row is (ok XOR error), never an exception
    for d in ("a.pdf", "b.pdf", "c.bin"):
        assert rows[d]["ok"] and rows[d]["n_spans"] > 0, rows[d]
    assert rows["page.html"]["ok"] and rows["page.html"]["n_text_chars"] > 50
    assert not rows["broken.pdf"]["ok"] and rows["broken.pdf"]["error"]
    assert not rows["noise.dat"]["ok"] and "unknown" in rows["noise.dat"]["error"]
    for r in rows.values():
        assert r["ok"] == (r["error"] is None)
    # report is one page, carries the headline counts and the error class
    assert "9 files, 6 ok" in report
    assert "| pdf | 4 | 3 " in report and "Error taxonomy" in report
    # spans variant: doc_id = path, intact docs carry real spans
    spans = {r["doc_id"].rsplit("/", 1)[-1]: r
             for r in extract_corpus_spans(
                 read_corpus_dir(spark, str(tmp_path))).collect()}
    assert len(spans["a.pdf"]["spans"]) == rows["a.pdf"]["n_spans"]
    assert spans["page.html"]["spans"][0]["kind"] == "text"
    # glob filter reaches the scan (binaryFile pathGlobFilter)
    only_pdf = read_corpus_dir(spark, str(tmp_path), glob="*.pdf")
    assert only_pdf.count() == 3  # c.bin excluded by name, broken included
    # empty-report path stays total-safe
    empty = corpus_report(
        outcomes.filter(F.col("kind") == "nope"), "empty")
    assert "0 files" in empty


def test_corpus_spans_match_fixture_goldens(spark, tmp_path):
    """The harness's extraction path IS the engine: spans it returns for a
    fixture PDF equal the fixture's golden spans (same invariant as the
    main pipeline, through the corpus code path)."""
    from unipdf_spark.fixtures.gen import make_doc
    from unipdf_spark.real_corpus import extract_corpus_spans, read_corpus_dir

    golden, pdf = make_doc("corpus_gold", "interleaved", seed=11)
    (tmp_path / "gold.pdf").write_bytes(pdf)
    [row] = extract_corpus_spans(
        read_corpus_dir(spark, str(tmp_path))).collect()
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
           for s in row["spans"]]
    want = [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in golden]
    assert got == want


def test_real_corpus_drop_when_present(spark):
    """Gate for the driver data drop: point UNIPDF_SPARK_REAL_CORPUS_DIR at
    any directory of real-world PDFs/HTML and this ingests it, asserts the
    per-row guarantees hold on bytes the repo did not author, and commits
    the report to BENCH/REAL_CORPUS.md. Skipped until the drop lands."""
    root = os.environ.get("UNIPDF_SPARK_REAL_CORPUS_DIR")
    if not root or not os.path.isdir(root):
        pytest.skip("no real-world corpus mounted (driver data drop)")
    from unipdf_spark.real_corpus import ingest_report

    outcomes, report = ingest_report(spark, root)
    rows = outcomes.collect()
    assert rows, "corpus dir is empty"
    for r in rows:
        assert r["ok"] == (r["error"] is None)  # outcome, never exception
    out = Path(__file__).resolve().parent.parent / "BENCH" / "REAL_CORPUS.md"
    out.write_text(report)
    ok = sum(1 for r in rows if r["ok"])
    print(f"real corpus: {len(rows)} files, {ok} ok → {out}")
