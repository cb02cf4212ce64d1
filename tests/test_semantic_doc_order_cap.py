"""Hot-cluster cap for semantic_doc_order: one mega-cluster must split
into deterministic vec_id-rank blocks of ``cap``, each chained greedily
and spliced in rank order — bounding any single applyInPandas task at
O(cap²·d) instead of O(c²·d). The DuckDB recursive-CTE oracle replays
the same sub-split (pure rank arithmetic), so the hash gate carries over
to capped inputs unchanged."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from overseer_spark.queries.catalog import CATALOG, _semantic_doc_order

NAME = "semantic_doc_order"
CAP = 8
N_HOT = 50  # one cluster far above the cap


@pytest.fixture(scope="module")
def hot_cluster_dir(spark):
    d = tempfile.mkdtemp(prefix="doc_order_hot_")
    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.randn(8)], 0) for i in range(N_HOT)
    ] + [(100 + int(i), [float(x) for x in rng.randn(8)], 1) for i in range(5)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(f"{d}/embeddings.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_capped_chain_matches_duckdb_replay(spark, hot_cluster_dir):
    got = sorted(
        tuple(r)
        for r in _semantic_doc_order(spark, hot_cluster_dir, cap=CAP).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{hot_cluster_dir}/embeddings.parquet/*.parquet'"
    )
    oracle = CATALOG[NAME].oracle.replace("4096", str(CAP))
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert got == want
    assert len(got) == N_HOT + 5


def test_blocks_bound_task_size_and_splice_in_rank_order(
    spark, hot_cluster_dir
):
    out = _semantic_doc_order(spark, hot_cluster_dir, cap=CAP)
    rows = {
        (r["cluster"], r["pos"]): r["vec_id"]
        for r in out.filter(F.col("cluster") == 0).collect()
    }
    ids_sorted = list(range(N_HOT))
    # every block's position range holds exactly that rank-block's ids —
    # i.e. no chain task ever saw more than CAP rows, and the splice is
    # rank-ordered; positions of the non-final block are contiguous
    # (sub*CAP + 1 .. sub*CAP + CAP)
    for b in range((N_HOT + CAP - 1) // CAP):
        block_ids = set(ids_sorted[b * CAP : (b + 1) * CAP])
        got = {
            rows[(0, p)]
            for p in range(b * CAP + 1, b * CAP + len(block_ids) + 1)
        }
        assert got == block_ids, f"block {b} leaked across the cap"


def test_cap_is_noop_below_threshold(spark, hot_cluster_dir):
    """Below the cap the capped walk IS the published full-cluster greedy
    chain — the fixture-scale output (clusters ≤ 46 docs at sf0.01) is
    byte-identical to the uncapped round-7 behavior."""
    capped = sorted(
        tuple(r)
        for r in _semantic_doc_order(
            spark, hot_cluster_dir, cap=1 << 20
        ).collect()
    )
    default = sorted(
        tuple(r)
        for r in CATALOG[NAME].fn(spark, hot_cluster_dir).collect()
    )
    # cluster 1 (5 docs) is below every cap: identical rows there
    c1_capped = [t for t in capped if t[0] == 1]
    c1_default = [t for t in default if t[0] == 1]
    assert c1_capped == c1_default
