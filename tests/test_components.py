"""Connected components: both strategies vs a Python union-find oracle on a
randomized graph; keep-canonical dedup semantics."""

from __future__ import annotations

import random

import pytest

from overseer_spark.operators.components import (
    connected_components,
    dedup_keep_canonical,
)


def uf_oracle(edges):
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for e in edges for n in e}


@pytest.fixture(scope="module")
def graph(spark):
    rng = random.Random(11)
    # several chains/cliques + isolated pairs; includes a long chain to
    # exercise multi-round label propagation
    edges = set()
    for base in range(0, 200, 20):
        chain = list(range(base, base + rng.randint(2, 12)))
        edges |= {(chain[i], chain[i + 1]) for i in range(len(chain) - 1)}
    edges |= {(1000 + i, 2000 + i) for i in range(10)}
    edges = sorted(edges)
    df = spark.createDataFrame(edges, schema="d1 long, d2 long")
    return df, edges


@pytest.mark.parametrize("strategy", ["local", "label_prop"])
def test_components_match_union_find(spark, graph, strategy):
    df, edges = graph
    got = {
        (r["node"], r["component"])
        for r in connected_components(df, strategy=strategy).collect()
    }
    assert got == set(uf_oracle(edges).items())


@pytest.mark.slow
def test_auto_routes_distributed_above_cap(spark, graph):
    df, edges = graph
    got = {
        (r["node"], r["component"])
        for r in connected_components(df, strategy="auto", local_edge_cap=5).collect()
    }
    assert got == set(uf_oracle(edges).items())


def test_dedup_keep_canonical(spark, graph):
    df, edges = graph
    oracle = uf_oracle(edges)
    all_nodes = sorted({n for e in edges for n in e} | {9999})  # 9999 isolated
    corpus = spark.createDataFrame([(n,) for n in all_nodes], schema="doc_id long")
    kept = {
        r["doc_id"] for r in dedup_keep_canonical(corpus, df, id_col="doc_id").collect()
    }
    want = {n for n in all_nodes if oracle.get(n, n) == n}
    assert kept == want


def test_er_match_clusters_vs_union_find(spark):
    """Cluster-size histogram from the catalog entry == a pure-python
    union-find over the same thresholded match pairs."""
    from collections import Counter

    from overseer_spark.queries.catalog import CATALOG, _er_scored_pairs
    from tests.conftest import SF_SMOKE

    pairs = [(r["x"], r["y"]) for r in _er_scored_pairs(spark, SF_SMOKE).collect()]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    sizes = Counter(find(x) for x in parent)
    want = sorted(Counter(sizes.values()).items())
    got = [
        (r["cluster_size"], r["n_clusters"])
        for r in CATALOG["er_match_clusters"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == want


def _py_kcore(pairs, k):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return set(adj)


def test_kcore_matches_python_peeler(spark):
    from overseer_spark.operators.components import kcore

    # a 4-clique (3-core) + a tail + a triangle (2-core only)
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # 4-clique
        (4, 5), (5, 6),                                   # tail
        (7, 8), (8, 9), (7, 9),                           # triangle
    ]
    edges = spark.createDataFrame(pairs, "u long, v long")
    got = {r["node"] for r in kcore(edges, k=3).collect()}
    assert got == _py_kcore(pairs, 3) == {1, 2, 3, 4}
    got2 = {r["node"] for r in kcore(edges, k=2).collect()}
    assert got2 == _py_kcore(pairs, 2) == {1, 2, 3, 4, 7, 8, 9}


def test_graph_kcore_catalog_entry_vs_python(spark):
    from pyspark.sql import functions as F

    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = [
        (r["u"], r["v"])
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("u", "v")
        .collect()
    ]
    want = _py_kcore(pairs, 3)
    row = CATALOG["graph_kcore"].fn(spark, SF_SMOKE).collect()[0]
    assert row["n_core_nodes"] == len(want)
    if want:
        assert row["min_node"] == min(want) and row["max_node"] == max(want)
