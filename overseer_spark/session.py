"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the configuration is chosen so the same
logical plans scale to a multi-executor cluster: AQE handles runtime shuffle
coalescing and skew joins, broadcast threshold keeps dimension joins
shuffle-free, and Arrow makes the pandas-UDF surface viable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "overseer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-planning — shuffle coalescing, skew-join splitting,
        # dynamic broadcast conversion. Essential at 100 TB, harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Dimension tables (region/nation/...) broadcast instead of shuffling.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for pandas_udf / applyInPandas / toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def configure_for_oracle(spark: SparkSession) -> SparkSession:
    """Runtime confs required for driver-provided sessions.

    The correctness driver may hand us a session we didn't build; these are
    all runtime-settable and required for value-hash parity with DuckDB
    (naive UTC timestamps) and for the pandas-UDF queries (Arrow).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # events.parquet carries TIMESTAMP(NANOS), which Spark has no native
    # type for; read as int64 ns and convert at the source (tables.py).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
