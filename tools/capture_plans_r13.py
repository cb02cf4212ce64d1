"""Capture explain("formatted") for the round-13 touched queries into
plans/r13/<name>_<tag>.txt. Run once on the r12 tree (tag=before, from
the snapshot worktree) and once on the r13 tree (tag=after).

Also captures the graph-compaction edge-fold REWRITE plan (the touched
plan lives inside a maintenance write, which the entries' returned
frames sever via localCheckpoint) as compact_edge_fold_<tag>.txt.

Usage: python tools/capture_plans_r13.py after [outdir]
"""

from __future__ import annotations

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = [
    "stream_ann_ingest",
    "stream_graph_ann_ingest",
    "ann_graph_index_lifecycle",
    "ann_ivf_index_topk",
    "ann_ivf_index_append",
    "ann_ivf_index_compact",
    "ann_ivf_index_delete",
    "ann_ivf_index_upsert",
    "hard_negative_mining_ann",
    "near_dup_keep_best",
]


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r13"
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    from overseer_spark.queries.catalog import CATALOG
    import overseer_spark.queries.catalog as C
    from overseer_spark.session import get_spark

    spark = get_spark("capture-plans-r13")
    spark.sparkContext.setLogLevel("ERROR")

    for name in ENTRIES:
        df = CATALOG[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} lines", flush=True)

    # the edge-fold rewrite plan (inside compact_graph_index, not visible
    # from any entry's returned frame): reproduce the exact rewrite
    # expression over the shared session index's edge relation
    idx = C._graph_ann_ooc_index(spark, SF_DIR)
    edges = spark.read.parquet(f"{idx}/edges")
    if tag == "before":
        w = edges.distinct().repartition(F.col("src"))
    else:
        w = edges.repartition(F.col("src")).dropDuplicates()
    plan = w._sc._jvm.PythonSQLUtils.explainString(
        w._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(outdir, f"compact_edge_fold_{tag}.txt"), "w") as f:
        f.write(plan)
    print(f"compact_edge_fold: {len(plan.splitlines())} lines")
    spark.stop()


if __name__ == "__main__":
    main()
