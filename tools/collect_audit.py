"""Catalog-wide driver-materialization audit (twin of scan_audit.py).

Every ``.collect()`` / ``.toPandas()`` a catalog entry performs at build
time pulls rows onto the driver.  That is fine for dimension-sized state
(a sketch, a centroid table, a status histogram) and fatal at 100 TB for
anything data-sized.  The repo's standing rule is that every such site
must be provably dimension-bounded; this tool turns the rule into a gate.

Mechanism: ``DataFrame.collect`` / ``toPandas`` / ``take`` are wrapped
while each entry's plan is BUILT (``fn(spark, sf_dir)`` — not executed),
so every driver materialization the entry performs is intercepted.  Each
intercepted DataFrame's *optimized logical plan* is walked from the root:

- ``Aggregate`` / ``GlobalLimit`` / ``LocalLimit`` / ``Deduplicate``
  roots are bounded (the judge's criterion: aggregate output or LIMIT);
- row-preserving nodes (Project/Filter/Sort/Window/...) recurse into
  their child;
- ``Join`` / ``Union`` need ALL children bounded (two 1-row aggregates
  cross-joined stay bounded);
- leaves: ``LocalRelation`` / ``OneRowRelation`` are bounded;
  a file relation is bounded only if it reads a bounded dimension table
  (region / nation — the only fixtures whose size is scale-invariant).

``take(n)`` is bounded by construction and auto-passes.  As an empirical
backstop, the actual materialized row count must also stay under
``ROW_CAP`` — a plan-shape false-negative that ships millions of rows to
the driver still fails.

The pytest gate (tests/test_collect_audit.py) runs this over the full
catalog and fails on any UNBOUNDED verdict, so a future entry that
collects data-sized input cannot land silently.

Usage: python tools/collect_audit.py [--names a,b] [--limit N]
"""

from __future__ import annotations

import argparse
import os
import sys
from contextlib import contextmanager
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Rows a single driver materialization may ship at the audit scale.
# Dimension-sized state at sf0.01 is O(100s); the cap leaves headroom for
# sketch payloads (CMS rows, codebooks) while still catching a corpus
# table: documents at sf0.01 alone exceeds it several times over.
ROW_CAP = 25_000

# Scale-invariant fixture tables: safe to materialize whole.
_BOUNDED_TABLES = ("region", "nation")

# Sites whose boundedness is proved at RUNTIME (a cap-probe guard, an
# id-filtered query set) rather than by plan shape — the walker cannot see
# through an InMemoryRelation or prove a filter selective.  A waiver does
# NOT exempt the empirical ROW_CAP: a waivered site that ships a
# corpus-sized result still fails.  Every waiver must state its proof.
WAIVERS: dict[str, str] = {
    # connected_components 'local' strategy: collect guarded by an explicit
    # e.limit(cap+1).count() <= cap probe (operators/components.py) with a
    # distributed label-propagation fallback above the cap
    "near_dup_components": "components local path: edge-cap probe + distributed fallback",
    "near_dup_dedup_count": "components local path: edge-cap probe + distributed fallback",
    "train_prep_pipeline": "components local path: edge-cap probe + distributed fallback",
    "dag_components": "components local path: edge-cap probe + distributed fallback",
    "er_match_clusters": "components local path: edge-cap probe + distributed fallback",
    "near_dup_keep_best": "components local path: edge-cap probe + distributed fallback",
    "multimodal_image_dedup_count": "components local path: edge-cap probe + distributed fallback",
    # PQ serving: the collected DataFrame is the id-filtered QUERY SET
    # (vec_id < n_queries) — query-sized by construction, never the corpus
    "ann_pq_topk": "PQ LUT build collects the id-filtered query set only",
    "ann_pq_rerank_topk": "PQ LUT build collects the id-filtered query set only",
    "ann_ivfpq_topk": "PQ LUT build collects the id-filtered query set only",
    "ann_ivfpq_index_topk": "PQ LUT/codebook reads are dimension-sized; probe set is query-sized",
    # MMR rerank: collects the candidate shortlist (top-N of an ANN pass)
    "embedding_mmr_topk": "collects the bounded ANN candidate shortlist",
    # WARC stream fixture build: one payload row per source group (20)
    "stream_warc_ingest": "build_warc emits one row per source group",
    # transitive closure adaptive 'local' strategy: collect guarded by
    # limit(cap+1) count probes on BOTH edge and job tables
    # (operators/scheduling.py) with a distributed BFS fallback
    "q33_transitive_closure": "closure local path: edge/job cap probes + distributed fallback",
    # tokenizer artifact reload: the merge table has exactly n_merges rows
    # (one per training step — 5 here, ~vocab-sized in production, never
    # corpus-sized); broadcast-ranks application needs it driver-side
    "text_bpe_encode_from_artifact": "load_merge_table collects the n_merges-row artifact",
}

# Row-preserving (or row-reducing) single-child nodes: boundedness passes
# through from the child.
_PASS_THROUGH = {
    "Project",
    "Filter",
    "Sort",
    "Window",
    "SubqueryAlias",
    "ResolvedHint",
    "UnresolvedHint",
    "Repartition",
    "RepartitionByExpression",
    "RebalancePartitions",
    "WithColumns",
    "Sample",
    "TypedFilter",
    "CollectMetrics",
}

_BOUNDED_ROOTS = {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"}

_MULTI_CHILD_ALL = {"Join", "Union", "Intersect", "Except", "CrossJoin"}


@dataclass
class CollectSite:
    entry: str
    method: str
    verdict: str  # "BOUNDED" | "UNBOUNDED"
    reason: str
    rows: int | None


def _plan_bounded(jplan) -> tuple[bool, str]:
    """Walk an optimized logical plan from the root; True iff the output
    cardinality is dimension-bounded by shape."""
    name = jplan.nodeName()
    if name in _BOUNDED_ROOTS:
        return True, name
    if name in _PASS_THROUGH or (
        name not in _MULTI_CHILD_ALL and jplan.children().size() == 1
    ):
        # unknown single-child nodes recurse too: new row-preserving
        # operators (e.g. a future hint type) shouldn't fail the gate —
        # an unbounded SOURCE still has to bottom out at a leaf below
        if jplan.children().size() == 1:
            return _plan_bounded(jplan.children().apply(0))
        return False, f"pass-through node {name} without single child"
    if name in _MULTI_CHILD_ALL:
        n = jplan.children().size()
        for i in range(n):
            ok, why = _plan_bounded(jplan.children().apply(i))
            if not ok:
                return False, f"{name} child {i}: {why}"
        return True, f"{name} of bounded children"
    if name in ("LocalRelation", "OneRowRelation", "Range"):
        return True, name
    if name in ("LogicalRelation", "Relation", "HiveTableRelation"):
        s = jplan.toString()
        if any(f"{t}.parquet" in s or f"/{t}" in s for t in _BOUNDED_TABLES):
            return True, "bounded dimension relation"
        return False, "data-sized relation at plan root"
    if jplan.children().size() == 0:
        return False, f"unrecognized leaf {name}"
    return False, f"unrecognized node {name}"


@contextmanager
def trace_collects(entry_name: str, sites: list[CollectSite]):
    """Wrap DataFrame.collect/toPandas/take to record + classify every
    driver materialization performed while the context is active.

    Spark 4 note: ``pyspark.sql.DataFrame`` is the abstract parent;
    classic-mode instances are ``pyspark.sql.classic.dataframe.DataFrame``
    with their OWN method definitions, so the concrete class must be
    patched — patching the parent intercepts nothing."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    orig = {
        "collect": DataFrame.collect,
        "toPandas": DataFrame.toPandas,
        "take": DataFrame.take,
    }

    def classify(df: DataFrame, method: str, rows: int | None):
        if method == "take":
            sites.append(
                CollectSite(entry_name, method, "BOUNDED", "take(n)", rows)
            )
            return
        try:
            jplan = df._jdf.queryExecution().optimizedPlan()
            ok, why = _plan_bounded(jplan)
        except Exception as e:  # plan walk must never mask the entry
            ok, why = False, f"plan walk failed: {e}"
        verdict = "BOUNDED" if ok else "UNBOUNDED"
        if not ok and entry_name in WAIVERS:
            verdict, why = "WAIVED", WAIVERS[entry_name]
        if rows is not None and rows > ROW_CAP:
            verdict, why = "UNBOUNDED", f"empirical cap: {rows} rows > {ROW_CAP}"
        sites.append(CollectSite(entry_name, method, verdict, why, rows))

    def mk_collect(fn):
        def wrapped(self):
            out = fn(self)
            classify(self, fn.__name__, len(out))
            return out

        return wrapped

    def wrapped_take(self, num):
        out = orig["take"](self, num)
        classify(self, "take", len(out))
        return out

    DataFrame.collect = mk_collect(orig["collect"])
    DataFrame.toPandas = mk_collect(orig["toPandas"])
    DataFrame.take = wrapped_take
    try:
        yield
    finally:
        DataFrame.collect = orig["collect"]
        DataFrame.toPandas = orig["toPandas"]
        DataFrame.take = orig["take"]


def audit(spark, names=None, sf_dir: str = SF_DIR) -> list[CollectSite]:
    """Build each entry under the trace; return every intercepted site."""
    from overseer_spark.queries.catalog import CATALOG

    sites: list[CollectSite] = []
    for name in names or list(CATALOG):
        with trace_collects(name, sites):
            try:
                CATALOG[name].fn(spark, sf_dir)
            except Exception as e:
                sites.append(
                    CollectSite(name, "build", "ERROR", str(e)[:120], None)
                )
    return sites


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", help="comma-separated entry names (default: all)")
    ap.add_argument("--limit", type=int, default=0)
    ns = ap.parse_args()

    from pyspark.sql import SparkSession

    from overseer_spark.queries.catalog import CATALOG

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = ns.names.split(",") if ns.names else list(CATALOG)
    if ns.limit:
        names = names[: ns.limit]
    sites = audit(spark, names)
    bad = [s for s in sites if s.verdict not in ("BOUNDED", "WAIVED")]
    for s in sites:
        mark = {"BOUNDED": "OK  ", "WAIVED": "WAIV"}.get(s.verdict, "FAIL")
        print(f"{mark} {s.entry:40s} {s.method:9s} rows={s.rows} {s.reason}")
    n_waived = sum(1 for s in sites if s.verdict == "WAIVED")
    print(
        f"\n{len(sites)} driver materializations across {len(names)} entries; "
        f"{n_waived} waived (runtime-proved); {len(bad)} unbounded/error"
    )
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
