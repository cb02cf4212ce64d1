"""Incremental (cross-batch) dedup: exact screen vs a Python set oracle,
near-dup screen vs whole-corpus minhash restricted to cross-batch pairs,
and the end-to-end survivor composition."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from overseer_spark.operators import incremental as INC
from overseer_spark.operators.dedup import minhash_near_duplicates
from tests.conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def split(spark):
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0).cache()
    batch = docs.filter(F.col("doc_id") % 2 == 1).cache()
    yield docs, corpus, batch
    corpus.unpersist()
    batch.unpersist()


@pytest.fixture(scope="module")
def synth(spark, split):
    """Batch with GUARANTEED cross-batch exact dups: the odd docs plus
    verbatim copies of 10 corpus docs under fresh odd ids (the sf0.01
    fixtures happen to contain no exact duplicates at all)."""
    docs, corpus, _ = split
    base = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = (
        corpus.orderBy("doc_id")
        .limit(10)
        .withColumn("_r", F.row_number().over(Window.orderBy("doc_id")))
        .withColumn("doc_id", F.lit(base) + F.col("_r") * 2 + 1)
        .drop("_r")
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).unionByName(copies).cache()
    yield corpus, batch
    batch.unpersist()


def test_exact_survivors_match_set_oracle(spark, synth):
    corpus, batch = synth
    corpus_texts = {r["text"] for r in corpus.select("text").collect()}
    batch_rows = batch.select("doc_id", "text").collect()
    first_for_text: dict[str, int] = {}
    for r in sorted(batch_rows, key=lambda r: r["doc_id"]):
        first_for_text.setdefault(r["text"], r["doc_id"])
    expected = sorted(
        doc_id
        for text, doc_id in first_for_text.items()
        if text not in corpus_texts
    )
    got = sorted(
        r["doc_id"]
        for r in INC.dedup_new_exact(batch, INC.exact_hash_index(corpus))
        .select("doc_id")
        .collect()
    )
    assert got == expected


def test_exact_survivors_keep_full_row_schema(spark, split):
    _, corpus, batch = split
    out = INC.dedup_new_exact(batch, INC.exact_hash_index(corpus))
    assert out.columns == batch.columns  # helper column dropped


def test_flagged_points_at_min_corpus_id(spark, synth):
    corpus, batch = synth
    corpus_min: dict[str, int] = {}
    for r in corpus.select("doc_id", "text").collect():
        k = r["text"]
        corpus_min[k] = min(corpus_min.get(k, 1 << 62), r["doc_id"])
    expected = sorted(
        (r["doc_id"], corpus_min[r["text"]])
        for r in batch.select("doc_id", "text").collect()
        if r["text"] in corpus_min
    )
    got = sorted(
        (r["new_id"], r["corpus_id"])
        for r in INC.flag_new_exact(batch, INC.exact_hash_index(corpus)).collect()
    )
    assert got == expected
    assert len(got) > 0  # fixture corpus contains cross-batch exact dups


def test_near_dup_vs_corpus_matches_whole_corpus_cross_pairs(spark, split):
    docs, corpus, batch = split
    whole = minhash_near_duplicates(docs)  # same defaults as the vs-corpus path
    cross = {
        (max(r["d1"], r["d2"]) if r["d1"] % 2 == 0 else r["d1"],
         r["d1"] if r["d1"] % 2 == 0 else r["d2"])
        for r in whole.collect()
        if r["d1"] % 2 != r["d2"] % 2
    }
    # normalize: (odd new_id, even corpus_id)
    cross = {
        (a, b) if a % 2 == 1 else (b, a)
        for (a, b) in cross
    }
    got = {
        (r["new_id"], r["corpus_id"])
        for r in INC.near_dup_vs_corpus(batch, corpus).collect()
    }
    assert got == cross
    assert len(got) > 0  # replicated fixture docs guarantee cross-batch near-dups


def test_incremental_dedup_composition(spark, split):
    _, corpus, batch = split
    exact = INC.dedup_new_exact(batch, INC.exact_hash_index(corpus))
    exact_ids = {r["doc_id"] for r in exact.select("doc_id").collect()}
    near_flagged = {
        r["new_id"] for r in INC.near_dup_vs_corpus(exact, corpus).collect()
    }
    expected = sorted(exact_ids - near_flagged)
    got = sorted(
        r["doc_id"]
        for r in INC.incremental_dedup(batch, corpus).select("doc_id").collect()
    )
    assert got == expected
    assert 0 < len(got) < batch.count()


def test_empty_corpus_passes_batch_self_deduped(spark, split):
    _, corpus, batch = split
    empty_index = INC.exact_hash_index(corpus.limit(0))
    out = INC.dedup_new_exact(batch, empty_index)
    # all batch content survives, but batch-internal exact dups collapse
    assert out.count() == batch.select("text").distinct().count()


def test_band_index_shape_and_partitionability(spark, split):
    _, corpus, _ = split
    idx = INC.minhash_band_index(corpus, bands=16, num_perm=64)
    assert idx.columns == ["band", "band_hash", "doc_id"]
    stats = idx.groupBy("band").count().collect()
    assert len(stats) == 16  # every band populated → partitionBy("band") balances


def test_substr_index_probe_equals_inline_recompute(spark, tmp_path):
    """The PERSISTED window-hash index (substr_window_index written to
    parquet and reloaded) screens a new batch row-identically to the
    inline recompute the incr_exact_substr_vs_corpus entry performs
    (VERDICT r9 ask #7 done-criteria). The catalog entry itself is
    unchanged/hash-stable — this pins the production index path against
    it."""
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") >= 200)
    batch = docs.filter(F.col("doc_id") < 200)

    # inline recompute (what the catalog entry does)
    inline = INC.probe_substr_index(batch, INC.substr_window_index(corpus))

    # persisted path: build once, write, reload, probe
    path = str(tmp_path / "substr_index")
    INC.substr_window_index(corpus).write.parquet(path)
    persisted = INC.probe_substr_index(batch, spark.read.parquet(path))

    key = lambda df: sorted(
        (r["doc_id"], r["n_windows"], r["dup_windows"], r["dup_frac"],
         r["flagged"])
        for r in df.collect()
    )
    a, b = key(inline), key(persisted)
    assert a == b and len(a) == batch.count()
    # index is 8 bytes per distinct window — one column, w only
    assert spark.read.parquet(path).columns == ["w"]


def test_substr_index_flags_known_duplicate(spark):
    """A batch doc that IS a corpus doc (full byte overlap) must flag:
    every one of its windows exists in the index."""
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") >= 200)
    # clone one corpus doc into the batch under a new id
    clone = corpus.limit(1).select(
        F.lit(-1).cast("long").alias("doc_id"), "text"
    )
    out = INC.probe_substr_index(clone, INC.substr_window_index(corpus))
    row = out.collect()[0]
    assert row["dup_frac"] == 1.0 and row["flagged"] == 1
