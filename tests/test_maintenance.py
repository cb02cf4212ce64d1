"""File-layout maintenance (sources/maintenance.py): profile, plan,
compact — row-preserving, file-count-reducing."""

from __future__ import annotations

from pyspark.sql import functions as F

from overseer_spark.sources.maintenance import (
    compact,
    compaction_plan,
    file_profile,
)


def _fragmented_table(spark, path, n_rows=5000, n_files=40):
    spark.range(n_rows).withColumn("v", F.col("id") * 2).repartition(
        n_files
    ).write.mode("overwrite").parquet(path)


def test_file_profile_counts_files_rows_bytes(spark, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, path)
    prof = file_profile(spark, path)
    rows = prof.collect()
    assert len(rows) == 40
    assert sum(r.rows for r in rows) == 5000
    assert all(r.bytes > 0 for r in rows)


def test_compaction_plan_flags_fragmentation(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _fragmented_table(spark, path)
    plan = compaction_plan(spark, path, target_file_mb=1)
    assert plan["n_files"] == 40
    assert plan["target_files"] < 40
    assert plan["worth_compacting"]


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    src = str(tmp_path / "frag3")
    out = str(tmp_path / "compacted")
    _fragmented_table(spark, src)
    compact(spark, src, out, target_file_mb=1)
    prof = file_profile(spark, out)
    assert prof.count() < 40
    before = spark.read.parquet(src)
    after = spark.read.parquet(out)
    assert after.count() == 5000
    assert sorted(map(tuple, before.collect())) == sorted(map(tuple, after.collect()))
