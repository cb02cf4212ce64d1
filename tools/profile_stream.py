"""Per-step breakdown of the streaming-ingest / lifecycle entries
(guide §1.1/§1.2: find where the fixed cost sits before touching code).

Monkeypatches the maintenance operators with timed wrappers (wall time +
Spark job count via job groups), runs the entry end-to-end N times, and
prints a per-step table. Job counts come from
``statusTracker().getJobIdsForGroup`` on a per-step group id.

Usage: python tools/profile_stream.py stream_ann_ingest --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

STEPS: list[dict] = []


def _wrap(spark, mod, name):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        gid = f"step-{len(STEPS)}"
        spark.sparkContext.setJobGroup(gid, name)
        t0 = time.perf_counter()
        try:
            return orig(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(gid))
            spark.sparkContext.setJobGroup(None, None)
            STEPS.append({"step": name, "sec": round(dt, 3), "jobs": jobs})

    setattr(mod, name, timed)
    return orig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entry")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from overseer_spark.operators import ann_index as AI
    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.session import get_spark

    spark = get_spark("profile-stream")
    spark.sparkContext.setLogLevel("ERROR")

    for name in (
        "append_to_ivf_index", "compact_ivf_index", "max_files_per_cell",
        "ivf_index_topk", "insert_into_graph_index", "compact_graph_index",
        "graph_index_file_counts", "graph_index_topk",
        "delete_from_graph_index", "upsert_into_ivf_index",
    ):
        _wrap(spark, AI, name)
    # the streaming module binds AI at call time (function-level imports),
    # so patching the module attributes above covers foreachBatch too

    fn = CATALOG[args.entry].fn
    # warm pass builds session artifacts + codegen
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for rep in range(args.reps):
        STEPS.clear()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        acc = sum(s["sec"] for s in STEPS)
        print(f"--- rep {rep}: total {total:.2f}s, steps {acc:.2f}s, "
              f"overhead {total - acc:.2f}s")
        for s in STEPS:
            print(f"    {json.dumps(s)}")
    spark.stop()


if __name__ == "__main__":
    main()
