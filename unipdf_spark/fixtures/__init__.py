"""Deterministic fixture generator: golden spans + rendered one-page PDFs.

Shares ONLY `unipdf_spark.schema` with the extraction engine (FIXTURES.md §5).
"""

from .gen import FIXTURE_CLASSES, make_corpus, make_doc  # noqa: F401
