"""Both closure strategies (recursive CTE / BFS loop) agree with a Python
reference on a randomized DAG."""

from __future__ import annotations

import random

import pytest

from overseer_spark.operators.scheduling import transitive_dependents


@pytest.fixture(scope="module")
def dag(spark):
    rng = random.Random(7)
    n = 200
    # random DAG: edges only from higher to lower ids (acyclic by construction)
    edges = []
    for child in range(1, n):
        for _ in range(rng.randint(0, 3)):
            parent = rng.randrange(0, child)
            edges.append((f"j{child}", f"j{parent}"))  # child depends on parent
    edges = sorted(set(edges))
    df = spark.createDataFrame(edges, schema="job_id string, dep_id string").cache()
    return df, edges


def py_dependents(edges, seed):
    out, frontier = set(), {seed}
    while frontier:
        nxt = {j for j, d in edges if d in frontier} - out
        out |= nxt
        frontier = nxt
    return out


@pytest.mark.parametrize(
    "strategy,seed",
    [
        ("recursive_cte", "j0"),  # deepest closure
        ("recursive_cte", "j5"),
        ("recursive_cte", "j150"),
        ("recursive_cte", "j199"),  # empty closure
        ("bfs", "j150"),  # shallow: keeps the per-level driver loop cheap
        ("bfs", "j199"),
        ("local", "j0"),
        ("local", "j199"),
    ],
)
def test_strategies_match_python(spark, dag, strategy, seed):
    df, edges = dag
    got = {
        r["id"]
        for r in transitive_dependents(df, [seed], strategy=strategy).collect()
    }
    assert got == py_dependents(edges, seed), f"{strategy} wrong for {seed}"


def test_bfs_deep_closure_with_checkpointing(spark, dag):
    """One deep-seed BFS run exercising the localCheckpoint path."""
    df, edges = dag
    got = {
        r["id"]
        for r in transitive_dependents(
            df, ["j0"], strategy="bfs", checkpoint_every=3
        ).collect()
    }
    assert got == py_dependents(edges, "j0")


def test_auto_falls_back(spark, dag):
    df, edges = dag
    got = {r["id"] for r in transitive_dependents(df, ["j3"], strategy="auto").collect()}
    assert got == py_dependents(edges, "j3")


def test_auto_uses_distributed_above_cap(spark, dag):
    """With the cap below the edge count, auto must route to a distributed
    strategy and still agree with the reference."""
    df, edges = dag
    got = {
        r["id"]
        for r in transitive_dependents(
            df, ["j5"], strategy="auto", local_edge_cap=10
        ).collect()
    }
    assert got == py_dependents(edges, "j5")


def test_local_raises_above_cap(spark, dag):
    df, _ = dag
    import pytest as _pt

    with _pt.raises(ValueError):
        transitive_dependents(df, ["j5"], strategy="local", local_edge_cap=10)


def test_dataframe_seeds(spark, dag):
    df, edges = dag
    seeds = spark.createDataFrame([("j0",), ("j150",)], schema="id string")
    got = {r["id"] for r in transitive_dependents(df, seeds).collect()}
    want = (py_dependents(edges, "j0") | py_dependents(edges, "j150")) - {"j0", "j150"}
    assert got == want


def test_topo_levels_matches_python(spark, dag):
    """topo_levels agrees with a Python longest-path-from-roots on the
    randomized DAG (includes diamonds — max, not first-visit, semantics)."""
    from overseer_spark.operators.scheduling import topo_levels

    df, edges = dag
    nodes = sorted({x for e in edges for x in e})
    jobs = spark.createDataFrame([(n,) for n in nodes], schema="id string")

    deps_of: dict[str, list[str]] = {}
    for j, d in edges:
        deps_of.setdefault(j, []).append(d)
    levels: dict[str, int] = {}

    def level(n: str) -> int:
        if n not in levels:
            ds = deps_of.get(n, [])
            levels[n] = 0 if not ds else 1 + max(level(d) for d in ds)
        return levels[n]

    expected = {n: level(n) for n in nodes}
    for strategy in ("auto", "distributed"):
        got = {
            r.id: r.level
            for r in topo_levels(jobs, df, strategy=strategy).collect()
        }
        assert got == expected, strategy


def test_pagerank_matches_power_iteration(spark, dag):
    """Spark pagerank == pure-Python power iteration on the random DAG
    (same simplified formulation: dangling mass dropped)."""
    from overseer_spark.operators.scheduling import pagerank

    df, edges = dag
    nodes = sorted({x for e in edges for x in e})
    jobs = spark.createDataFrame([(n,) for n in nodes], schema="id string")

    n = len(nodes)
    d = 0.85
    outd: dict[str, int] = {}
    for j, _ in edges:
        outd[j] = outd.get(j, 0) + 1
    ranks = {x: 1.0 / n for x in nodes}
    for _ in range(10):
        incoming = {x: 0.0 for x in nodes}
        for j, dep in edges:
            incoming[dep] += ranks[j] / outd[j]
        ranks = {x: (1.0 - d) / n + d * incoming[x] for x in nodes}

    # BOTH physical strategies must match the reference recurrence: the
    # driver-side fast path (auto, small graph) and the distributed loop
    for strategy in ("auto", "distributed"):
        got = {
            r.id: r.rank
            for r in pagerank(jobs, df, iterations=10, strategy=strategy).collect()
        }
        assert set(got) == set(ranks)
        for x in nodes:
            assert abs(got[x] - ranks[x]) < 1e-9, (strategy, x, got[x], ranks[x])
        # ranks form a probability-mass-like vector (<=1 with dangling loss)
        assert 0 < sum(got.values()) <= 1.0 + 1e-9


def test_detect_cycles_kahn(spark):
    """detect_cycles (dag_cycle_check's operator): on a graph with a
    3-cycle plus a clean chain, exactly the cycle members AND everything
    dependency-locked behind them are flagged; the clean chain is not."""
    from overseer_spark.operators.scheduling import detect_cycles

    # chain a->b->c (a depends on b, b on c); cycle x->y->z->x; w depends on x
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z"), ("z", "x"), ("w", "x")]
    nodes = sorted({n for e in edges for n in e})
    jobs = spark.createDataFrame([(n,) for n in nodes], schema="id string")
    deps = spark.createDataFrame(edges, schema="job_id string, dep_id string")
    for strategy in ("auto", "distributed"):
        stuck = {
            r.id for r in detect_cycles(jobs, deps, strategy=strategy).collect()
        }
        assert stuck == {"x", "y", "z", "w"}, strategy

    # acyclic-only graph: nothing flagged (both physical strategies)
    deps2 = spark.createDataFrame(edges[:2], schema="job_id string, dep_id string")
    jobs2 = spark.createDataFrame([("a",), ("b",), ("c",)], schema="id string")
    for strategy in ("auto", "distributed"):
        assert detect_cycles(jobs2, deps2, strategy=strategy).count() == 0


@pytest.mark.slow
def test_critical_path_strategies_agree(spark, dag):
    """critical_path: the driver-side Kahn fast path and the distributed
    wave relaxation produce identical max-plus longest paths on the
    random DAG, with deterministic id-keyed weights."""
    from pyspark.sql import functions as F

    from overseer_spark.operators.scheduling import critical_path

    df, edges = dag
    nodes = sorted({x for e in edges for x in e})
    jobs = spark.createDataFrame(
        [(n, 1 + (hash(n) % 7)) for n in nodes], schema="id string, weight long"
    )
    local = {
        r.id: r.cp
        for r in critical_path(jobs, df, strategy="auto").collect()
    }
    dist = {
        r.id: r.cp
        for r in critical_path(jobs, df, strategy="distributed").collect()
    }
    assert local == dist and len(local) == len(nodes)


def test_detect_cycles_dangling_dep_parity(spark):
    """An edge to a dep_id that is not a job row (malformed graph — the
    integrity-audit op's most likely input) must report the dependent as
    stuck under BOTH strategies: the ghost dep is never done, so the job
    can never start. Regression: the driver fast path used to drop such
    edges entirely and silently diverge from the distributed leg."""
    from overseer_spark.operators.scheduling import detect_cycles

    jobs = spark.createDataFrame([("a",), ("b",)], schema="id string")
    deps = spark.createDataFrame(
        [("a", "ghost")], schema="job_id string, dep_id string"
    )
    for strategy in ("auto", "distributed"):
        stuck = {r.id for r in detect_cycles(jobs, deps, strategy=strategy).collect()}
        assert stuck == {"a"}, strategy


@pytest.fixture(scope="module")
def sparse_graph(spark):
    """Edge-sparse, node-heavy: the 100 TB ingest shape that breaks an
    edges-only probe — many independent jobs, a handful of edges."""
    nodes = [f"n{i}" for i in range(60)]
    edges = [("n1", "n0"), ("n2", "n1"), ("n3", "n2")]
    jobs = spark.createDataFrame(
        [(n, 1 + (i % 5)) for i, n in enumerate(nodes)],
        schema="id string, weight long",
    )
    deps = spark.createDataFrame(edges, schema="job_id string, dep_id string")
    return jobs, deps, nodes, edges


def test_probe_bounds_nodes_not_just_edges(spark, sparse_graph):
    """The auto-strategy probe must reject the driver fast path when the
    JOBS table exceeds the cap even though the edge table is tiny —
    otherwise jobs.select('id').collect() is unbounded on an edge-sparse
    100 TB jobs table."""
    from overseer_spark.operators.scheduling import _local_graph_ok

    jobs, deps, nodes, _ = sparse_graph
    assert not _local_graph_ok(jobs, deps, cap=10)  # 3 edges pass, 60 nodes don't
    assert _local_graph_ok(jobs, deps, cap=100)  # both bounded -> local ok


@pytest.mark.slow
def test_edge_sparse_auto_routes_distributed_and_matches(spark, sparse_graph):
    """With cap=10 the sparse graph (3 edges / 60 nodes) must take the
    distributed leg (probe unit-tested above gates exactly this) and every
    dag_* op must return the same result the local fast path computes."""
    from overseer_spark.operators.scheduling import (
        critical_path,
        detect_cycles,
        pagerank,
        topo_levels,
    )

    jobs, deps, nodes, edges = sparse_graph

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for op, kw in (
        (topo_levels, {}),
        (detect_cycles, {}),
        (critical_path, {}),
    ):
        small_cap = rows(op(jobs, deps, strategy="auto", local_edge_cap=10, **kw))
        local = rows(op(jobs, deps, strategy="auto", local_edge_cap=10_000, **kw))
        assert small_cap == local, op.__name__

    pr_dist = {
        r.id: r.rank
        for r in pagerank(jobs, deps, strategy="auto", local_edge_cap=10).collect()
    }
    pr_local = {
        r.id: r.rank
        for r in pagerank(jobs, deps, strategy="auto", local_edge_cap=10_000).collect()
    }
    assert set(pr_dist) == set(pr_local) == set(nodes)
    for n in nodes:
        assert abs(pr_dist[n] - pr_local[n]) < 1e-9, n
