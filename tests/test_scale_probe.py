"""Scale-behavior probe: replicate the corpus 5× (shifted ids) and check
the near-dedup pipeline collapses it EXACTLY back to the distinct-content
count. Verifies the property that matters at 100 TB — duplicates arriving
from many shards/crawls fold to one canonical row, with the LSH path
(candidates, not n²) doing the work."""

from __future__ import annotations

from pyspark.sql import functions as F

from overseer_spark.operators import dedup as D
from overseer_spark.operators.components import dedup_keep_canonical
from overseer_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_replicated_corpus_collapses_to_distinct_texts(spark):
    docs = load_table(spark, SF_CORRECTNESS, "documents").select("doc_id", "text")
    rep = docs
    for i in range(1, 5):
        rep = rep.union(
            docs.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"), "text"
            )
        )
    rep = rep.cache()
    n_docs = rep.count()
    n_distinct = docs.select("text").distinct().count()
    assert n_docs == 5 * docs.count()

    pairs = D.minhash_near_duplicates(rep, threshold=0.99)
    kept = dedup_keep_canonical(rep, pairs)
    # every replica (and every in-corpus exact dup) shares identical
    # shingle sets → identical MinHash signatures → same LSH bucket →
    # exact-Jaccard 1.0 → one canonical survivor per distinct text
    assert kept.count() == n_distinct
    # canonical = min doc_id, so every survivor is an ORIGINAL row
    assert kept.filter(F.col("doc_id") >= 1_000_000).count() == 0
    rep.unpersist()
