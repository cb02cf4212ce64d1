"""Bucketed tables: co-located, shuffle-free joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides.
Spark's bucketing (`bucketBy` on write) pre-hash-partitions *and* tags the
table metadata so Catalyst proves both sides are already partitioned by
the join key — the sort-merge join then runs with ZERO shuffle exchanges,
round after round, query after query. The write pays the shuffle once;
every subsequent join/groupBy on that key is free of it.

The reference's analogue is its b-tree indexes on the hot columns
(overseer/store/jdbc.clj:151-153) — pay at write time, win at read time.

Notes that matter in production (encoded here, asserted in
tests/test_bucketing.py):

- both sides must have the SAME bucket count and key, or Spark falls back
  to shuffling the mismatched side;
- `spark.sql.sources.bucketing.enabled` must stay on (default), and
  reading must go through the table name, not the bare path — path reads
  lose the bucket metadata;
- bucket pruning applies to equality predicates on the bucket key, so
  point lookups (R1-style) touch 1/N of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets makes the downstream sort-merge join skip its
    sort too — the join becomes a pure streaming merge of pre-sorted,
    pre-partitioned files.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = (
        df.write.mode(mode)
        .format(fmt)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table BY NAME (path reads drop bucket metadata)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key, same-bucket-count tables — plans with no shuffle
    exchange on either side (asserted in tests/test_bucketing.py)."""
    on = [on] if isinstance(on, str) else on
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
