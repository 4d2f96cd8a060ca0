"""Regression tests for bench.py's loud-failure contract (r9 VERDICT #2).

r9 shipped a committed bench artifact whose 100k soak silently flipped
from 0 errors / span_equality 1.0 to 1 error / 0.99999 — a hard breach
of the north rule that nothing in the artifact named. The contract now:
whenever any tier's span equality < 1.0, bench prints the failing
doc_ids + error strings to stderr and carries them in a top-level
``span_equality_violations`` field (empty list == clean round).
"""
from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module)
from unipdf_spark import pipeline  # noqa: E402


@pytest.fixture(scope="module")
def docs(spark):
    return pipeline.gen_docs_pdf(spark, 24, mix="default", partitions=4).persist()


def test_clean_corpus_yields_no_violations(spark, docs, capsys):
    eq = pipeline.span_equality(docs, pipeline.run_extraction(docs))
    assert eq.filter(F.col("match")).count() == 24
    assert bench.collect_violations(eq, "headline") == []


def test_soak_inequality_is_loud(spark, docs, capsys):
    """Corrupt ONE doc's bytes the way the r9 regression surfaced (a
    whole-doc extraction error): the violation list must name the doc,
    its fixture class, and the error string, and stderr must carry a
    grep-able SPAN EQUALITY VIOLATION line."""
    bad_id = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    broken = docs.withColumn(
        "pdf_bytes",
        F.when(F.col("doc_id") == bad_id,
               F.lit(b"\x00not a pdf at all")).otherwise(F.col("pdf_bytes")),
    )
    eq = pipeline.span_equality(docs, pipeline.run_extraction(broken))
    n_match = eq.filter(F.col("match")).count()
    assert n_match == 23  # exactly the corrupted doc fails

    v = bench.collect_violations(eq, "soak")
    assert len(v) == 1
    assert v[0]["tier"] == "soak"
    assert v[0]["doc_id"] == bad_id
    assert v[0]["fixture_class"]  # class is carried for reproduction
    assert v[0]["error"]  # the typed PdfError string, not None
    err = capsys.readouterr().err
    assert f"SPAN EQUALITY VIOLATION [soak] {bad_id}" in err
    assert v[0]["error"] in err


def test_missing_extraction_row_counts_as_violation(spark, docs):
    """A doc whose extraction row is absent entirely (match NULL after the
    left join) is a violation too — silence must never read as a pass."""
    bad_id = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    spans = pipeline.run_extraction(docs).filter(F.col("doc_id") != bad_id)
    eq = pipeline.span_equality(docs, spans)
    v = bench.collect_violations(eq, "headline")
    assert [x["doc_id"] for x in v] == [bad_id]
