"""Source readers with Iceberg-first, parquet-fallback semantics.

At 100 TB the source layer is where most of the win lives: Iceberg gives
partition pruning + file skipping on `doc_id` ranges and snapshot isolation
for resume; parquet gives rowgroup pruning via pushed filters. Both arrive
through the same `spark.read` declarative path so Catalyst keeps
`PushedFilters`/`ReadSchema` tight (verify with `.explain("formatted")`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, path_or_table: str,
               fmt: str | None = None) -> DataFrame:
    """Read an Iceberg table name (`catalog.db.tbl`) or a parquet path.

    Iceberg is attempted when the identifier has no filesystem separator and
    the runtime is present; otherwise parquet. Scan stays declarative either
    way (column pruning + predicate pushdown are applied by Catalyst at the
    caller's `select`/`filter`)."""
    if fmt == "iceberg" or (fmt is None and "/" not in path_or_table):
        try:
            return spark.read.format("iceberg").load(path_or_table)
        except Exception:
            pass  # Iceberg runtime not on classpath (sandbox) → parquet
    return spark.read.parquet(path_or_table)


def read_docs(spark: SparkSession, location: str,
              min_doc_id: str | None = None,
              max_doc_id: str | None = None) -> DataFrame:
    """Read the interleaved-docs table (doc_id, spans…) with optional doc_id
    range predicates — pushed to the scan (partition/rowgroup pruning)."""
    df = read_table(spark, location)
    if min_doc_id is not None:
        df = df.filter(df.doc_id >= min_doc_id)
    if max_doc_id is not None:
        df = df.filter(df.doc_id < max_doc_id)
    return df
