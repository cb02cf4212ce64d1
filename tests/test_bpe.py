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
        for w in r["text"].split(" "):
            if w:
                expected.extend(bpe.encode_word(w, ranks))
        assert out[r["doc_id"]] == (len(expected), expected), f"doc {r['doc_id']}"


def test_encode_single_space_boundary(spark):
    """ADVICE r10: the encoder's word boundary is a single space — runs
    of spaces contribute zero tokens and tab/newline stay INSIDE a word,
    matching string_split(text, ' ') oracle semantics, not str.split()."""
    docs = spark.createDataFrame(
        [(1, "ab  ab"), (2, " ab "), (3, "a\tb ab")], "doc_id long, text string"
    )
    merges = [("a", "b")]
    out = {
        r["doc_id"]: (r["n_tokens"], list(r["tokens"]))
        for r in bpe.encode_corpus(docs, merges, end_marker=False).collect()
    }
    assert out[1] == (2, ["ab", "ab"])  # double space → no extra token
    assert out[2] == (1, ["ab"])  # leading/trailing spaces → nothing
    # tab is word-internal: 'a\tb' never matches the ('a','b') pair
    assert out[3] == (4, ["a", "\t", "b", "ab"])


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


def test_merge_table_artifact_round_trip(spark, tmp_path):
    """The distributed trainer's merge table persists and reloads as the
    SAME rank-ordered pair list (VERDICT r9 ask #6): one merge source —
    train_chain — feeds the train entries and the encoder artifact, and
    encoding with the reloaded merges is token-identical to encoding
    with the in-memory ones."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
    vocabs, bests = bpe.train_chain(docs, steps=4)
    table = bpe.merge_table(bests)
    in_memory = [
        tuple(r["merged_pair"].split(" "))
        for r in table.orderBy("step").collect()
    ]
    path = str(tmp_path / "merges")
    bpe.save_merge_table(table, path)
    reloaded = bpe.load_merge_table(spark, path)
    assert reloaded == in_memory and len(reloaded) == 4
    enc_a = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe.encode_corpus(docs, in_memory, end_marker=False).collect()
    }
    enc_b = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe.encode_corpus(docs, reloaded, end_marker=False).collect()
    }
    assert enc_a == enc_b


def test_learned_order_apply_equals_greedy_rank_apply():
    """Applying merges exhaustively in learned order (what the unrolled
    SQL oracle does) equals encode_word's greedy lowest-rank-first rule
    — the equivalence the text_bpe_encode_from_artifact oracle rests
    on. Exercise overlapping runs where the two-pass replace semantics
    matter."""
    merges = [("a", "a"), ("aa", "a"), ("b", "c"), ("aaa", "bc")]
    ranks = {p: i for i, p in enumerate(merges)}
    for word in ("aaaabc", "aaa", "aaaa", "abcabc", "bcbc", "xaaay"):
        sym = list(word)
        for a, b in merges:  # learned order, exhaustive left-to-right
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        assert sym == bpe.encode_word(word, ranks, end_marker=False), word
