"""Salting preserves semantics: salted aggregate/join equal their plain
counterparts on a deliberately skewed dataset (90% of rows on one key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 90k rows on key 0, 10k spread over 100 keys
    hot = spark.range(90_000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(10_000).select(
        (F.col("id") % 100 + 1).alias("k"), (F.col("id") % 89).cast("double").alias("v")
    )
    return hot.union(cold).cache()


def test_salted_aggregate_matches_plain(spark, skewed):
    from overseer_spark.operators.skew import salted_aggregate

    plain = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in salted_aggregate(
            skewed,
            "k",
            {"n": ("count", "*"), "total": ("sum", "v"), "mx": ("max", "v")},
            salt_buckets=8,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][0] == salted[k][0], f"count differs for {k}"
        assert abs(plain[k][1] - salted[k][1]) < 1e-6, f"sum differs for {k}"
        assert plain[k][2] == salted[k][2], f"max differs for {k}"


def test_salted_join_matches_plain(spark, skewed):
    from overseer_spark.operators.skew import salted_join

    dim = spark.range(101).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("k_name")
    )
    plain = skewed.join(dim, "k").groupBy("k", "k_name").count()
    salted = salted_join(skewed, dim, "k", salt_buckets=8).groupBy("k", "k_name").count()
    p = sorted(tuple(r) for r in plain.collect())
    s = sorted(tuple(r) for r in salted.collect())
    assert p == s


@pytest.mark.parametrize("S", [2, 3, 4, 7])
def test_replicate_for_block_pairs_exact_once_coverage(spark, S):
    """Every unordered row pair within a group must be examinable in
    EXACTLY one (group, _bi, _bj) task — the invariant that makes the
    salted SemDeDup stage 2 (and embedding_knn_graph) semantics-
    preserving, for any salt count. Also: replication factor is exactly
    salt_buckets, and each row's (s, s) task appears exactly once (the
    member-emission contract)."""
    from itertools import combinations

    from overseer_spark.operators.skew import replicate_for_block_pairs

    df = spark.range(300).select(
        F.col("id").alias("rid"), (F.col("id") % 3).alias("grp")
    )
    rep = replicate_for_block_pairs(df, "rid", S).collect()
    assert len(rep) == 300 * S
    # group task members: (grp, bi, bj) -> {rid}, plus each rid's own block
    tasks: dict = {}
    blk: dict = {}
    for r in rep:
        assert r["_bi"] <= r["_bj"]
        tasks.setdefault((r["grp"], r["_bi"], r["_bj"]), set()).add(r["rid"])
        blk[r["rid"]] = r["_blk"]
    by_grp: dict = {}
    for r in rep:
        by_grp.setdefault(r["grp"], set()).add(r["rid"])
    for g, members in by_grp.items():
        for a, b in combinations(sorted(members), 2):
            covering = [
                key
                for key, rids in tasks.items()
                if key[0] == g and a in rids and b in rids
                and key[1] == min(blk[a], blk[b])
                and key[2] == max(blk[a], blk[b])
            ]
            assert len(covering) == 1, (a, b, covering)
    # each row appears in its diagonal task exactly once (collect dedups
    # nothing — row multiplicity in the exploded frame is what matters)
    diag = [r for r in rep if r["_bi"] == r["_bj"] == r["_blk"]]
    assert len(diag) == 300


@pytest.mark.parametrize("hot_threshold,s", [(3, 4), (0, 3), (10_000, 2)])
def test_salted_wedges_matches_plain_self_join(spark, hot_threshold, s):
    """Every unordered out-edge pair of every apex appears EXACTLY once,
    whichever side of the hot split the apex lands on — hot apexes via
    block-pair tasks, cold via the plain self-join (threshold 10_000
    forces all-cold; 0 forces all-hot)."""
    from overseer_spark.operators.skew import salted_wedges

    # apex 1 is hot (7 out-edges), apexes 2/3 are cold (2 and 1)
    edges = [(1, d, h) for d, h in [(9, 10), (9, 11), (8, 12), (7, 13),
                                     (7, 14), (6, 15), (5, 16)]]
    edges += [(2, d, h) for d, h in [(4, 20), (3, 21)]]
    edges += [(3, 2, 30)]
    oe = spark.createDataFrame(
        [(x, {"d": d, "n": n}) for x, d, n in edges],
        "x long, hi struct<d: long, n: long>",
    )
    got = sorted(
        (r["x"], tuple(r["h1"]), tuple(r["h2"]))
        for r in salted_wedges(
            oe, hot_threshold=hot_threshold, salt_buckets=s
        ).collect()
    )
    w1, w2 = oe.alias("w1"), oe.alias("w2")
    plain = w1.join(
        w2, (F.col("w1.x") == F.col("w2.x")) & (F.col("w1.hi") < F.col("w2.hi"))
    ).select(
        F.col("w1.x").alias("x"),
        F.col("w1.hi").alias("h1"),
        F.col("w2.hi").alias("h2"),
    )
    want = sorted(
        (r["x"], tuple(r["h1"]), tuple(r["h2"])) for r in plain.collect()
    )
    assert got == want
    assert len(got) == 7 * 6 // 2 + 1 + 0  # C(7,2) + C(2,2->1 pair) + none


def test_salted_wedges_short_circuits_when_no_apex_hot(spark):
    """VERDICT r8 #1: with no hot apex the salted machinery (semi/anti
    splits + empty replicated leg + union) is pure fixed overhead, so
    salted_wedges must return the PLAIN self-join plan — no Union, no
    block-pair explode.  With the threshold at 0 every apex is hot and
    the salted path (Union of cold + hot legs) must still engage."""
    from overseer_spark.operators.skew import salted_wedges

    oe = spark.createDataFrame(
        [(1, {"d": 2, "n": 5}), (1, {"d": 2, "n": 6}), (2, {"d": 1, "n": 7})],
        "x long, hi struct<d: long, n: long>",
    )
    cold = salted_wedges(oe, hot_threshold=100, salt_buckets=8)
    cold_plan = cold._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in cold_plan
    assert "explode" not in cold_plan.lower()
    assert sorted(
        (r["x"], r["h1"]["n"], r["h2"]["n"]) for r in cold.collect()
    ) == [(1, 5, 6)]

    hot = salted_wedges(oe, hot_threshold=0, salt_buckets=4)
    hot_plan = hot._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in hot_plan
    assert sorted(
        (r["x"], r["h1"]["n"], r["h2"]["n"]) for r in hot.collect()
    ) == [(1, 5, 6)]
