"""Bucketed tables must deliver the property they exist for: joins and
aggregations on the bucket key plan with NO shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from overseer_spark.plans import exchange_count, explain_str
from overseer_spark.sources.bucketing import bucketed_join, read_table, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    write_bucketed(orders, "b_orders", "o_custkey", num_buckets=8, sort_cols="o_custkey")
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        num_buckets=8,
        sort_cols="o_custkey",
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path so the plan must rely on bucket metadata
    (at real fact-fact scale neither side broadcasts anyway)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables, no_broadcast):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, on="o_custkey")
    assert exchange_count(joined) == 0, explain_str(joined, "simple")


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, on="o_custkey")
    plain = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").join(
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet").withColumnRenamed(
            "c_custkey", "o_custkey"
        ),
        "o_custkey",
    )
    assert joined.count() == plain.count()


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = read_table(spark, lt).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert exchange_count(agg) == 0, explain_str(agg, "simple")


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over bare parquet paths must shuffle — proves
    the assertion above is measuring bucketing, not AQE accidents."""
    a = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    b = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_custkey")
        assert exchange_count(joined) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
