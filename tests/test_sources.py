"""Connector round-trips: every registered format writes and re-reads the
same rows; partitioned parquet writes prune on the partition column."""

from __future__ import annotations

import pytest

from overseer_spark.sources import connectors as C
from overseer_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF_SMOKE, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, nation, tmp_path, fmt):
    path = str(tmp_path / f"rt_{fmt}")
    C.write(nation, fmt, path)
    back = C.read(spark, fmt, path, schema=nation.schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in nation.collect()
    )


def test_unknown_format_raises(spark, nation, tmp_path):
    with pytest.raises(ValueError, match="unknown source format"):
        C.read(spark, "avrox", "/nope")
    with pytest.raises(ValueError, match="unknown sink format"):
        C.write(nation, "avrox", "/nope")


def test_partitioned_write_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from overseer_spark.plans import explain_str

    cust = load_table(spark, SF_SMOKE, "customer")
    path = str(tmp_path / "cust_part")
    C.write(cust, "parquet", path, partition_by=("c_mktsegment",))
    back = C.read(spark, "parquet", path).filter(F.col("c_mktsegment") == "BUILDING")
    # partition pruning: the scan must enumerate only the BUILDING directory
    text = explain_str(back)
    assert "PartitionFilters" in text and "c_mktsegment" in text
    expected = cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert back.count() == expected


def test_stream_reader(spark, nation, tmp_path):
    path = str(tmp_path / "stream_src")
    C.write(nation, "parquet", path)
    sdf = C.read_stream(spark, "parquet", path, schema=nation.schema)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("src_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT COUNT(*) c FROM src_stream").collect()[0]["c"] == 25


def test_parquet_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution contract: files written before a column existed
    read back as NULL for that column under mergeSchema — appends never
    require rewriting history (the additive-evolution rule every
    long-lived lakehouse table relies on)."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        out, mode="append"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(out, mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
