"""Sequence packing invariants: capacity respected, every row packed
exactly once, oversize rows isolated, determinism across input layouts,
and FFD fill quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from overseer_spark.operators.packing import pack_greedy, packing_stats


def _docs(spark, n=500, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 % 190) + 10).cast("int").alias("n_tokens"),
    )


def test_capacity_and_coverage(spark):
    df = _docs(spark)
    packed = pack_greedy(df, capacity=256)
    per_pack = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("used"))
    assert per_pack.filter(F.col("used") > 256).count() == 0
    # every doc appears exactly once
    assert packed.count() == 500
    assert packed.select("doc_id").distinct().count() == 500


def test_oversize_rows_get_singleton_packs(spark):
    df = spark.createDataFrame(
        [(1, 600), (2, 600), (3, 100), (4, 100)], "doc_id long, n_tokens int"
    )
    packed = {
        r["doc_id"]: r["pack_id"]
        for r in pack_greedy(df, capacity=256, num_partitions=1).collect()
    }
    assert packed[1] != packed[2]  # each oversize doc alone
    assert packed[3] == packed[4]  # small docs share a pack


def test_deterministic_across_layouts(spark):
    a = pack_greedy(_docs(spark, parts=4), capacity=256).collect()
    b = pack_greedy(_docs(spark, parts=11).orderBy(F.desc("doc_id")), capacity=256).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fill_quality_and_stats(spark):
    df = _docs(spark)
    stats = packing_stats(pack_greedy(df, capacity=256), capacity=256).first()
    assert stats["n_rows"] == 500
    # FFD on ~100-token-mean docs should fill packs well past half
    assert stats["mean_fill"] > 0.6
    assert stats["wasted_tokens"] >= 0


def test_sharded_packing_invariants_and_layout_independence(spark):
    from overseer_spark.operators.packing import pack_greedy_sharded

    df = _docs(spark, parts=4)
    packed = pack_greedy_sharded(df, capacity=256)
    rows = packed.collect()
    # every row packed exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in df.collect()
    )
    # fill <= capacity per pack (oversize rows are singletons)
    fills = {}
    for r in rows:
        fills.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for sizes in fills.values():
        assert sum(sizes) <= 256 or len(sizes) == 1
    # layout independence: different partitioning + input order, same packs
    b = pack_greedy_sharded(
        _docs(spark, parts=11).orderBy(F.desc("doc_id")), capacity=256
    ).collect()
    key = lambda r: (r["doc_id"], r["pack_id"], r["pack_slot"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, b))
