"""BPE tokenizer: merge-learning determinism, round-trip fidelity, and
distributed-encode parity with the pure-Python encoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from overseer_spark.functions import bpe
from tests.conftest import SF_SMOKE


def test_learn_bpe_merges_most_frequent_pair_first():
    merges = bpe.learn_bpe(["low low low lower lowest"], n_merges=3)
    # 'l-o' and 'o-w' tie at freq 5; the documented lexicographic
    # tie-break picks ('o','w'), then 'l'+'ow' fuses the full stem
    assert merges[0] == ("o", "w")
    assert merges[1] == ("l", "ow")
    assert len(merges) == 3


def test_encode_round_trips_characters():
    texts = ["the quick brown fox jumps over the lazy dog the end"] * 3
    merges = bpe.learn_bpe(texts, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in "the quick brown lazy".split():
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks).replace(bpe._END, "") == w  # lossless


def test_frequent_words_become_single_tokens():
    texts = ["the cat and the dog and the bird and the fish"] * 5
    merges = bpe.learn_bpe(texts, n_merges=100)
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("the", ranks) == ["the" + bpe._END]
    assert bpe.encode_word("and", ranks) == ["and" + bpe._END]


def test_distributed_encode_matches_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(40)
    merges = bpe.train_from_sample(docs, n_merges=80, sample_docs=30)
    assert len(merges) > 0
    out = {
        r["doc_id"]: (r["n_tokens"], list(r["tokens"]))
        for r in bpe.encode_corpus(docs, merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for r in docs.select("doc_id", "text").collect():
        expected: list[str] = []
        for w in r["text"].split():
            expected.extend(bpe.encode_word(w, ranks))
        assert out[r["doc_id"]] == (len(expected), expected), f"doc {r['doc_id']}"


def test_compression_beats_characters(spark):
    """Learned merges must actually compress: tokens ≪ characters."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
    merges = bpe.train_from_sample(docs, n_merges=150, sample_docs=80)
    stats = (
        bpe.encode_corpus(docs, merges)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .agg(F.sum("n_tokens").alias("t"), F.sum("n_chars").alias("c"))
        .collect()[0]
    )
    assert stats["t"] < stats["c"] / 2  # ≥2x better than char-level
