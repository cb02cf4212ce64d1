"""Parquet table sources for the analytics surface.

All reads go through ``spark.read.parquet`` so Catalyst gets native
vectorized scans with predicate pushdown and column pruning; at cluster
scale the same call reads a partitioned directory tree and prunes
partitions from pushed filters. (Reference analogue: the JDBC/Datomic
store reads in overseer/store/jdbc.clj:45-60 — here the "store" is the
columnar lakehouse itself.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from overseer_spark.session import configure_for_oracle

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_for_oracle(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
        # reader rejects; nanosAsLong (set in configure_for_oracle) reads it
        # as int64 ns. Truncate to µs TimestampType — the same truncation
        # DuckDB applies — so both engines see identical values.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
