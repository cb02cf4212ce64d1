"""Custom Python DataSource (sources/pydatasource.py): schema, partition
planning, deterministic executor-side reads, filter pushdown into the
source, and the micro-batch streaming reader."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan, StringContains

from overseer_spark.sources.pydatasource import (
    SyntheticDocsReader,
    make_doc,
    register,
)


def test_pushdown_narrows_range_unit():
    r = SyntheticDocsReader({"rows": "1000", "partitions": "8"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 100),
                LessThan(("doc_id",), 200),
                StringContains(("text",), "spark"),
            ]
        )
    )
    # the doc_id range comparisons are consumed; the string filter is not
    assert leftover == [StringContains(("text",), "spark")]
    assert (r.lo, r.hi) == (100, 200)
    parts = r.partitions()
    assert sum(p.hi - p.lo for p in parts) == 100
    assert parts[0].lo == 100 and parts[-1].hi == 200


def test_pushdown_equality_single_row_partitioning():
    r = SyntheticDocsReader({"rows": "1000", "partitions": "8"})
    list(r.pushFilters([EqualTo(("doc_id",), 42)]))
    parts = r.partitions()
    assert len(parts) == 1 and (parts[0].lo, parts[0].hi) == (42, 43)


def test_batch_read_deterministic(spark):
    register(spark)
    df = spark.read.format("synthetic_docs").option("rows", 500).load()
    assert df.columns == ["doc_id", "text", "lang", "n_tokens"]
    assert df.count() == 500
    assert df.select("doc_id").distinct().count() == 500
    assert df.rdd.getNumPartitions() == 8
    row = df.filter(F.col("doc_id") == 7).collect()[0]
    assert tuple(row) == make_doc(7)
    # second read identical (pure function of doc_id)
    again = spark.read.format("synthetic_docs").option("rows", 500).load()
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))


def test_filter_pushdown_end_to_end(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", 10000)
        .option("partitions", 4)
        .load()
        .filter((F.col("doc_id") >= 9900) & (F.col("doc_id") < 9950))
    )
    got = sorted(r.doc_id for r in df.select("doc_id").collect())
    assert got == list(range(9900, 9950))
    # residual (non-pushable) predicates still apply post-scan
    n = (
        spark.read.format("synthetic_docs")
        .option("rows", 1000)
        .load()
        .filter((F.col("doc_id") < 100) & (F.col("lang") == "en"))
        .count()
    )
    expected = sum(1 for i in range(100) if make_doc(i)[2] == "en")
    assert n == expected


def test_catalog_entry_matches_python_oracle(spark):
    """PY-tier oracle for the pyds_docs_scan catalog entry."""
    from collections import defaultdict

    from overseer_spark.queries.catalog import CATALOG

    got = [tuple(r) for r in CATALOG["pyds_docs_scan"].fn(spark, "").collect()]
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for i in range(1500):
        _, _, lang, n_tokens = make_doc(i)
        agg[lang][0] += 1
        agg[lang][1] += n_tokens
    expected = [(k, v[0], v[1]) for k, v in sorted(agg.items())]
    assert got == expected


def test_stream_reader_micro_batches(spark, tmp_path):
    register(spark)
    sdf = (
        spark.readStream.format("synthetic_docs")
        .option("rows", 300)
        .option("batch_rows", 100)
        .load()
    )
    name = f"pyds_{tmp_path.name}"
    query = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= 300:
                break
            time.sleep(0.5)
        got = sorted(map(tuple, spark.table(name).collect()))
        assert got == sorted(make_doc(i) for i in range(300))
    finally:
        query.stop()


# ---------------------------------------------------------------------------
# writer: jsonl sink with commit protocol
# ---------------------------------------------------------------------------

def test_jsonl_sink_writes_commit_manifest_and_roundtrips(spark, tmp_path):
    import json
    import os

    from overseer_spark.sources.pydatasource import register_sink

    register_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100).selectExpr(
        "id", "concat('doc-', id) AS name", "id % 7 AS bucket"
    ).repartition(4)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()

    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    parts = [f for f in files if f.startswith("part-")]
    assert len(parts) == 4
    assert not [f for f in files if f.startswith("_tmp_")], "temps left behind"
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(m["rows"] for m in manifest["files"]) == 100
    assert sorted(m["file"] for m in manifest["files"]) == parts

    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    got = {(r["id"], r["name"], r["bucket"]) for r in back.collect()}
    want = {(r["id"], r["name"], r["bucket"]) for r in df.collect()}
    assert got == want


def test_jsonl_sink_requires_path(spark):
    import pytest as _pytest

    from overseer_spark.sources.pydatasource import register_sink

    register_sink(spark)
    with _pytest.raises(Exception, match="path"):
        spark.range(3).write.format("jsonl_sink").mode("append").save()
