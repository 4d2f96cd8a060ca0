"""Table sources. The north-rule input is an Iceberg table of interleaved
docs; in this sandbox the same reader falls back to parquet (the Iceberg
runtime jar is not present). Pushdown-friendly: always pass column subsets
and filters through the DataFrame API so they reach the scan."""

from .readers import read_docs, read_table  # noqa: F401
