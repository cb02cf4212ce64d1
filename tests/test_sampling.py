"""Deterministic sampling/splitting: reproducibility across partitionings
(the property F.rand(seed) lacks), leakage-safety for equal keys, and
fraction accuracy."""

from __future__ import annotations

from overseer_spark.operators.sampling import hash_bucket, hash_split, stratified_sample
from pyspark.sql import functions as F


def _docs(spark, n=2000, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"),
    )


def test_split_stable_under_repartitioning(spark):
    df = _docs(spark)
    a = hash_split(df, "doc_id").select("doc_id", "split").collect()
    b = hash_split(df.repartition(13), "doc_id").select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_split_fraction_and_leakage(spark):
    df = _docs(spark)
    out = hash_split(df, "doc_id", test_fraction=0.25)
    frac = out.filter(F.col("split") == "test").count() / out.count()
    assert 0.2 < frac < 0.3
    # equal keys → same split, always (duplicated docs can't straddle)
    dup = df.union(df)
    sides = (
        hash_split(dup, "doc_id")
        .groupBy("doc_id")
        .agg(F.count_distinct("split").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert sides == 1


def test_salt_redeal(spark):
    df = _docs(spark)
    a = {r[0] for r in hash_split(df, "doc_id").filter("split='test'").select("doc_id").collect()}
    b = {
        r[0]
        for r in hash_split(df, "doc_id", salt="v2").filter("split='test'").select("doc_id").collect()
    }
    assert a != b  # different deal ...
    assert abs(len(a) - len(b)) < len(a)  # ... similar size


def test_stratified_fractions(spark):
    df = _docs(spark)
    out = stratified_sample(df, "lang", {"en": 1.0, "de": 0.5}, "doc_id")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["en"] == 500  # fraction 1.0 keeps every row
    assert 650 < got["de"] < 850  # ~half of 1500
    # stratum not in the dict → dropped
    none = stratified_sample(df, "lang", {"en": 0.5}, "doc_id").filter("lang = 'de'").count()
    assert none == 0


def test_bucket_uniformity(spark):
    df = _docs(spark, n=4000)
    m = df.select(F.avg(hash_bucket("doc_id")).alias("m")).first()["m"]
    assert 0.45 < m < 0.55


def test_seeded_sample_deterministic(spark):
    """r13_seeded_sample (R13 seeded random pick): same seed → identical
    rows across runs, all drawn from the source table."""
    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_SMOKE

    a = [r.o_orderkey for r in CATALOG["r13_seeded_sample"].fn(spark, SF_SMOKE).collect()]
    b = [r.o_orderkey for r in CATALOG["r13_seeded_sample"].fn(spark, SF_SMOKE).collect()]
    assert a == b and len(a) == 10
    from overseer_spark.sources.tables import load_table

    keys = {r.o_orderkey for r in load_table(spark, SF_SMOKE, "orders").select("o_orderkey").collect()}
    assert set(a) <= keys


def test_weighted_sample_prefers_heavy_weights(spark):
    """E-S race: with 10 heavy (w=1000) vs 90 light (w=1) rows and k=10,
    the heavy rows must dominate the sample across independent salts."""
    from overseer_spark.operators.sampling import weighted_sample

    rows = [(i, 1000 if i < 10 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    heavy_picked = total = 0
    for salt in ("a", "b", "c", "d", "e"):
        picked = {r["doc_id"] for r in weighted_sample(df, 10, "w", salt=salt).collect()}
        assert len(picked) == 10
        heavy_picked += sum(1 for d in picked if d < 10)
        total += 10
    assert heavy_picked / total > 0.8  # E[heavy share] ≈ 96%, 0.8 leaves slack


def test_weighted_sample_is_salt_deterministic(spark):
    from overseer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i, i + 1) for i in range(200)], "doc_id long, w long")
    a1 = [tuple(r) for r in weighted_sample(df, 20, "w", salt="x").collect()]
    a2 = [tuple(r) for r in weighted_sample(df.repartition(13), 20, "w", salt="x").collect()]
    b = [tuple(r) for r in weighted_sample(df, 20, "w", salt="y").collect()]
    assert a1 == a2          # partitioning-independent
    assert a1 != b           # salt redraws


def test_group_kfold_zero_leakage(spark, duck):
    """q_group_kfold_split: no user may appear in more than one fold, all
    events covered, and the per-fold counts match the oracle."""
    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.sources.tables import load_table
    from tests.conftest import SF_CORRECTNESS

    rows = CATALOG["q_group_kfold_split"].fn(spark, SF_CORRECTNESS).collect()
    assert {r["fold"] for r in rows} == set(range(5))
    ev = load_table(spark, SF_CORRECTNESS, "events")
    total_events = ev.count()
    total_users = ev.select("user_id").distinct().count()
    assert sum(r["n_events"] for r in rows) == total_events
    # fold-exclusive users: per-fold distinct sums to global distinct
    assert sum(r["n_users"] for r in rows) == total_users
