"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input so per-row-heavy work parallelizes.

    Small single-file parquet inputs arrive as ONE partition, serializing
    every downstream higher-order-function/UDF on one core. At lakehouse
    scale inputs are already many splits and this is a no-op; locally it
    buys cores-× speedup for CPU-bound column work. Hash-partitioning on the
    id also pre-aligns later groupBy/join shuffles on that key.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
