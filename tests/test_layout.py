"""Data-layout writers: range clustering and Z-ordering must (a) preserve
the data exactly and (b) measurably enable row-group pruning — asserted
from real parquet footer statistics, not plan inspection."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from overseer_spark.sources import layout as L
from tests.conftest import SF_CORRECTNESS

N_FILES = 16


@pytest.fixture(scope="module")
def li(spark):
    df = spark.read.parquet(f"{SF_CORRECTNESS}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    yield df.cache()
    df.unpersist()


@pytest.fixture(scope="module")
def dirs():
    paths = [tempfile.mkdtemp(prefix=f"layout_{n}_") for n in ("base", "clu", "zo")]
    yield paths
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)


def _fingerprint(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_partkey").alias("sp"),
        F.sum("l_quantity").alias("sq"),
    ).collect()[0]


def test_clustered_write_preserves_data_and_prunes(spark, li, dirs):
    base, clu, _ = dirs
    # baseline: round-robin layout — every file spans the full key range
    li.repartition(N_FILES).write.mode("overwrite").parquet(base)
    L.write_clustered(li, clu, ["l_partkey"], num_files=N_FILES)

    assert _fingerprint(spark.read.parquet(clu)) == _fingerprint(li)

    lo, hi = 100.0, 200.0  # ~5% of the partkey domain at this SF
    b = L.pruning_stats(spark, base, {"l_partkey": (lo, hi)})
    c = L.pruning_stats(spark, clu, {"l_partkey": (lo, hi)})
    assert b["row_groups_matching"] == b["row_groups_total"]  # no layout → no skip
    assert c["row_groups_total"] >= N_FILES
    assert c["row_groups_matching"] <= max(2, c["row_groups_total"] // 4)


def test_zorder_prunes_on_both_dimensions(spark, li, dirs):
    base, clu, zo = dirs
    L.write_zordered(li, zo, ["l_partkey", "l_suppkey"], num_files=N_FILES)

    assert _fingerprint(spark.read.parquet(zo)) == _fingerprint(li)

    part_rng = (100.0, 200.0)
    smin, smax = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).collect()[0]
    width = max(1, (smax - smin) // 10)
    supp_rng = (float(smin), float(smin + width))  # ~10% of suppkey domain

    z_part = L.pruning_stats(spark, zo, {"l_partkey": part_rng})
    z_supp = L.pruning_stats(spark, zo, {"l_suppkey": supp_rng})
    # linear clustering on partkey alone cannot skip anything for suppkey
    lin_supp = L.pruning_stats(spark, clu, {"l_suppkey": supp_rng})

    assert z_part["row_groups_matching"] < z_part["row_groups_total"]
    assert z_supp["row_groups_matching"] < z_supp["row_groups_total"]
    assert lin_supp["row_groups_matching"] == lin_supp["row_groups_total"]
    # both-dim rectangle prunes at least as hard as either single dim
    z_rect = L.pruning_stats(
        spark, zo, {"l_partkey": part_rng, "l_suppkey": supp_rng}
    )
    assert z_rect["row_groups_matching"] <= min(
        z_part["row_groups_matching"], z_supp["row_groups_matching"]
    )


def test_zorder_key_bounds(spark, li):
    bits = 6
    key_col = L.zorder_key(li, ["l_partkey", "l_suppkey"], bits=bits)
    row = li.select(key_col.alias("k")).agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()[0]
    assert row["lo"] >= 0
    assert row["hi"] < 1 << (bits * 2)


def test_pruned_scan_returns_same_rows(spark, li, dirs):
    """Row-group skipping is a pure optimization: filtered results over the
    clustered layout equal the filtered original."""
    _, clu, _ = dirs
    pred = (F.col("l_partkey") >= 100) & (F.col("l_partkey") <= 200)
    expected = sorted(
        (r["l_orderkey"], r["l_partkey"], r["l_suppkey"])
        for r in li.filter(pred).collect()
    )
    got = sorted(
        (r["l_orderkey"], r["l_partkey"], r["l_suppkey"])
        for r in spark.read.parquet(clu).filter(pred).collect()
    )
    assert got == expected
