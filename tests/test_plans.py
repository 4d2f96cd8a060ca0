"""Physical-plan property tests: the plans we ship must keep the properties
that survive a 100× scale-up — predicate pushdown, column pruning, broadcast
dimension joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from unipdf_spark.plans import (
    has_broadcast_join,
    n_broadcast_hints,
    pushed_filters,
    read_schema_columns,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") < 24)
        .select("l_orderkey", "l_quantity")
    )
    pf = pushed_filters(df)
    assert any("l_quantity" in f for f in pf), pf


def test_column_pruning_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
    )
    cols = read_schema_columns(df)
    assert cols and set(cols[0]) == {"l_orderkey", "l_extendedprice"}


def test_q3_no_forced_broadcast_hints(spark):
    # orders/customer are fact-sized at 100×: they must NOT carry a forced
    # broadcast hint; at this SF Catalyst/AQE still selects broadcast joins
    # from size stats, so the plan stays broadcast WITHOUT the hint
    from unipdf_spark.operators.tpch import q3_shipping_priority

    df = q3_shipping_priority(spark, SF)
    assert n_broadcast_hints(df) == 0
    assert has_broadcast_join(df)


def test_q5_hints_only_on_dimensions(spark):
    # supplier/nation/region stay hinted (true dimensions, bounded size);
    # orders/customer must be unhinted (AQE decides at runtime)
    from unipdf_spark.operators.tpch import q5_local_supplier_volume

    df = q5_local_supplier_volume(spark, SF)
    assert n_broadcast_hints(df) == 3
    assert has_broadcast_join(df)


def test_top_customers_no_forced_broadcast_hints(spark):
    from unipdf_spark.operators.tpch import top_customers_per_segment

    assert n_broadcast_hints(top_customers_per_segment(spark, SF)) == 0


def test_textops_prune_to_two_columns(spark):
    from unipdf_spark.operators.textops import token_counts

    cols = read_schema_columns(token_counts(spark, SF))
    assert cols and set(cols[0]) <= {"doc_id", "text"}


def test_sources_reader_pushes_docid_range(spark):
    from unipdf_spark.sources import read_docs

    df = read_docs(spark, f"{SF}/documents.parquet", min_doc_id="10")
    pf = pushed_filters(df)
    assert any("doc_id" in f for f in pf), pf
