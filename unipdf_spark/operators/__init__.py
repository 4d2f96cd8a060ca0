"""Analytics/query operators over the driver test tables.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL producing identical
column names/values). Aggregates are rounded on BOTH sides to keep the
driver's value-hash stable across engines' float summation orders.
"""

from . import dedup, extracted, htmlops, similarity, textops, tpch  # noqa: F401


def all_queries():
    out = {}
    for m in (tpch, textops, dedup, similarity, extracted, htmlops):
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in (tpch, textops, dedup, similarity, extracted, htmlops):
        out.update(m.ORACLES)
    return out
