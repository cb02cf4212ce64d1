"""Round-9 entries: exact-substring duplication spans, distributed BPE
merge training, Z-order layout buckets. Oracle parity is covered by
tests/test_oracle_parity.py (all three are sql-tier); these tests pin the
operator-level semantics and plan properties the hash cannot see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from overseer_spark.plans import explain_str
from overseer_spark.queries.catalog import CATALOG
from tests.conftest import SF_CORRECTNESS, SF_SMOKE


def q(name, spark, sf=SF_SMOKE):
    return CATALOG[name].fn(spark, sf)


# ---------------------------------------------------------------------------
# text_exact_substr_spans
# ---------------------------------------------------------------------------


def test_exact_substr_shuffles_hashes_not_window_text(spark):
    """The distinct/count exchanges must ride the 8-byte xxhash64, never
    the 40-char window string: no `substr`-producing projection may sit
    ABOVE an Exchange in the plan (windows are hashed before they
    leave the scanning task)."""
    plan = explain_str(q("text_exact_substr_spans", spark))
    assert "xxhash64" in plan
    # every Exchange's output should be hash/source/doc-shaped; the raw
    # window string column never appears as an exchange attribute
    for seg in plan.split("Exchange")[1:]:
        header = seg.split("\n", 1)[0]
        assert "win" not in header, header


def test_exact_substr_word_anchors_align_across_offsets(spark):
    """Word-start anchoring is content-defined: the same shared run at
    DIFFERENT byte offsets in two docs (different prefix lengths) must
    still emit identical windows — the property a document-phased
    stride grid lacks. Crafted pair sharing a 60-char run; doc 3 is
    disjoint and must not hit."""
    shared = "the quick brown fox jumps over the lazy dog again and again"
    assert len(shared) >= 40 + 10
    docs = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " tail one", "s1"),
            (2, "BBBBBBBBBBBB " + shared + " other tail", "s2"),
            (3, "completely unrelated text with no overlap at all here", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    anchors = F.filter(
        F.sequence(F.lit(1), F.greatest(F.length("text") - 39, F.lit(1))),
        lambda i: (i == 1) | (F.col("text").substr(i - 1, F.lit(1)) == " "),
    )
    wins = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                anchors,
                lambda i: F.xxhash64(F.col("text").substr(i, F.lit(40))),
            )
        ).alias("w"),
    ).distinct()
    nd = wins.groupBy("w").count().filter("count >= 2")
    hit_docs = {
        r["doc_id"]
        for r in wins.join(nd, "w").select("doc_id").distinct().collect()
    }
    assert hit_docs == {1, 2}


# ---------------------------------------------------------------------------
# text_bpe_merge_train
# ---------------------------------------------------------------------------


def test_bpe_merge_counts_non_increasing_and_symbols_consistent(spark):
    """Classical BPE invariant: the winning pair count never increases
    across rounds (a new pair containing a merged symbol occurs at most
    as often as the sub-pair it replaced); new_symbol is the pair with
    the space removed; steps are 1..5."""
    rows = q("text_bpe_merge_train", spark, SF_CORRECTNESS).collect()
    assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    for r in rows:
        assert r["new_symbol"] == r["merged_pair"].replace(" ", "")
        assert " " in r["merged_pair"]


def test_bpe_two_pass_replace_merges_overlapping_runs(spark):
    """The boundary-anchored two-pass replace must merge EVERY
    occurrence in an overlapping run (single-pass replace misses every
    other one): 'a b a b a b a b' with best pair 'a b' -> 'ab ab ab ab'."""
    df = spark.createDataFrame([("a b a b a b a b",), ("a a a",)], "sym string")
    pat = F.lit(" a b ")
    rep = F.lit(" ab ")
    padded = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
    merged = F.trim(F.replace(F.replace(padded, pat, rep), pat, rep))
    out = [r[0] for r in df.select(merged).collect()]
    assert out[0] == "ab ab ab ab"
    # greedy left-to-right on 'a a a' with pair 'a a' merges once
    pat2, rep2 = F.lit(" a a "), F.lit(" aa ")
    merged2 = F.trim(F.replace(F.replace(padded, pat2, rep2), pat2, rep2))
    assert df.select(merged2).collect()[1][0] == "aa a"


def test_bpe_corpus_scanned_once_rounds_run_on_vocab(spark):
    """Scale property: the 5 merge rounds run over the cached VOCAB
    relation — the documents parquet is scanned exactly once in the
    final plan (the word-frequency aggregate), not once per round."""
    df = q("text_bpe_merge_train", spark)
    plan = explain_str(df)
    assert plan.count("documents.parquet") <= 1, (
        "corpus re-scanned by the merge rounds"
    )


# ---------------------------------------------------------------------------
# layout_zorder_buckets
# ---------------------------------------------------------------------------


def test_zorder_buckets_bound_both_dimensions(spark, duck):
    """The data-skipping property: every z-bucket's rectangle spans at
    most ~1/8 of EACH key range (top-6-bit bucket fixes 3 high bits per
    dimension), so a 2-D range predicate can prune on file-level min/max
    stats. Linear layout cannot bound the second dimension."""
    rows = q("layout_zorder_buckets", spark, SF_CORRECTNESS).collect()
    assert 1 < len(rows) <= 64
    px = duck.sql("SELECT MAX(l_partkey) FROM lineitem").fetchone()[0]
    sx = duck.sql("SELECT MAX(l_suppkey) FROM lineitem").fetchone()[0]
    for r in rows:
        # quantization cell width is (max+1)/256; 3 fixed high bits leave
        # 32 cells of slack per dimension
        assert r["pk_span"] <= (px + 1) / 8 + (px + 1) / 256, r
        assert r["sk_span"] <= (sx + 1) / 8 + (sx + 1) / 256, r
    assert sum(r["n_rows"] for r in rows) == duck.sql(
        "SELECT COUNT(*) FROM lineitem"
    ).fetchone()[0]


def test_bpe_train_apply_curve_monotone_and_char_baseline(spark, duck):
    """Step 0 must equal the character count of the filtered word
    multiset; each merge strictly decreases corpus symbols."""
    rows = q("text_bpe_train_apply", spark, SF_CORRECTNESS).collect()
    assert [r["step"] for r in rows] == [0, 1, 2, 3, 4, 5]
    totals = [r["total_symbols"] for r in rows]
    assert all(a > b for a, b in zip(totals, totals[1:])), totals
    chars = duck.sql(
        """SELECT SUM(len(w)) FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents)
           WHERE regexp_matches(w, '^[a-z]+$') AND len(w) <= 20"""
    ).fetchone()[0]
    assert totals[0] == chars


# ---------------------------------------------------------------------------
# ann_ivf_index_append
# ---------------------------------------------------------------------------


def test_ivf_append_equals_one_shot_build(spark, tmp_path):
    """Ingest batching must not change probe results: base-then-append
    must serve EXACTLY the rows of a one-shot write of base+batch at the
    same centroids (FAISS add semantics — centroids frozen on append)."""
    from overseer_spark.operators import ann_index as AI
    from overseer_spark.operators.similarity import assign_cells
    from overseer_spark.sources.tables import load_table

    vecs = load_table(spark, SF_SMOKE, "embeddings")
    base = vecs.filter(F.col("vec_id") >= 100)
    batch = vecs.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 100))
    queries = vecs.filter(F.col("vec_id") < 10)

    p_inc = str(tmp_path / "inc")
    AI.build_ivf_index(base, p_inc, n_cells=8)
    AI.append_to_ivf_index(batch, p_inc)

    # one-shot: same centroids (read back from the incremental index so
    # both paths share them bit-exactly), single write of base+batch
    p_one = str(tmp_path / "one")
    cents = spark.read.parquet(f"{p_inc}/centroids")
    cents.write.parquet(f"{p_one}/centroids")
    assigned = assign_cells(
        base.unionByName(batch).select("vec_id", "embedding"),
        centroids=cents.select(
            F.col("cell").alias("vec_id"), F.col("embedding")
        ),
    )
    assigned.write.partitionBy("cell").parquet(f"{p_one}/vectors")

    r_inc = AI.ivf_index_topk(spark, p_inc, queries, k=5, n_probe=4).collect()
    r_one = AI.ivf_index_topk(spark, p_one, queries, k=5, n_probe=4).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(r_inc, key=key) == sorted(r_one, key=key)
    assert len(r_inc) > 0


def test_ivf_append_entry_probe_sees_appended_vectors(spark):
    """The entry's merged index must be able to RETURN appended ids:
    with the base excluding vec_id < 100, any result id in [10, 100)
    proves the append is served; at minimum the probe output is
    non-empty and never returns a query's own id."""
    rows = q("ann_ivf_index_append", spark, SF_CORRECTNESS).collect()
    assert rows
    assert all(r["vec_id"] != r["query_id"] for r in rows)
    assert all(r["vec_id"] >= 10 for r in rows)
