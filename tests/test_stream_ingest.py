"""Streaming incremental-dedup screen (streaming/ingest.py):
single-batch parity with the batch operator, and the cross-batch property —
a duplicate of a doc accepted in an EARLIER micro-batch is caught, which a
plain stream-static join cannot do."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from overseer_spark.operators import incremental as INC
from overseer_spark.streaming.ingest import incremental_dedup_stream
from tests.conftest import SF_CORRECTNESS


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="stream_ingest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _await(query, timeout=300):
    try:
        assert query.awaitTermination(timeout), "stream did not drain in time"
    finally:
        query.stop()


def test_single_batch_matches_batch_operator(spark, tmp):
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_CORRECTNESS)
        .filter(F.col("doc_id") % 2 == 1)
    )
    q = incremental_dedup_stream(
        stream, corpus, f"{tmp}/survivors", f"{tmp}/flags",
        checkpoint_path=f"{tmp}/ckpt",
    )
    _await(q)

    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{tmp}/survivors").select("doc_id").collect()
    )
    expected = sorted(
        r["doc_id"]
        for r in INC.incremental_dedup(batch, corpus).select("doc_id").collect()
    )
    assert got == expected

    flags = spark.read.parquet(f"{tmp}/flags")
    kinds = {r["kind"] for r in flags.select("kind").distinct().collect()}
    assert kinds <= {"exact", "near"}
    assert flags.filter(F.col("kind") == "near").count() > 0


def test_duplicate_across_micro_batches_is_caught(spark, tmp):
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")], schema
    )
    fresh = "one two three four five six seven eight nine ten"
    b1 = spark.createDataFrame([(1, fresh)], schema)
    b2 = spark.createDataFrame(
        [(3, fresh), (5, "totally different words with no overlap at all")],
        schema,
    )
    src = f"{tmp}/src"
    b1.coalesce(1).write.mode("overwrite").parquet(f"{src}/f1")
    b2.coalesce(1).write.mode("overwrite").parquet(f"{src}/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = incremental_dedup_stream(
        stream, corpus, f"{tmp}/survivors", f"{tmp}/flags",
        checkpoint_path=f"{tmp}/ckpt",
    )
    _await(q)

    survivors = {
        r["doc_id"]
        for r in spark.read.parquet(f"{tmp}/survivors").select("doc_id").collect()
    }
    # doc 3 duplicates doc 1, which was only ever seen ON THE STREAM —
    # it must be screened out by the accepted-survivor feedback loop
    # (whichever of f1/f2 lands first, one copy survives, the other doesn't)
    assert 5 in survivors
    assert len(survivors & {1, 3}) == 1
    flags = spark.read.parquet(f"{tmp}/flags")
    flagged = {(r["new_id"], r["matched_id"]) for r in flags.collect()}
    assert flagged & {(3, 1), (1, 3)}
