"""Catalog-wide physical-plan scan-count audit.

Spark performs NO cross-branch subexpression reuse: every plan branch
that references an aggregate re-derives it all the way down to its own
``FileScan``.  An operator that joins three aggregates of the same token
stream therefore scans the corpus three times — invisible at sf0.01,
triple cost at 100 TB.  This tool builds every catalog entry's physical
plan and reports entries whose parquet-scan count exceeds the number of
DISTINCT parquet paths they read (the lower bound a branch-free plan
would achieve), ranked by the excess.

The round-6 reworks this audit drove (DSIR 6→3 scans, bigram perplexity
4→3, PMI 5→4, JSD 4→2, vocab overlap 3→2) are pinned in
tests/test_plans.py::test_lm_family_scan_counts_pinned; this tool is the
discovery half — run it after adding entries.

Caveats: entries that execute work at build time (streams, store FSM
traces, roundtrip writers, entries that collect) still run here — the
sweep takes minutes, like the parity gate.  Excess scans are a REVIEW
QUEUE, not automatically bugs: re-reading a filtered dimension twice can
beat caching it, windows can't express every marginal, and some entries
deliberately trade a duplicate scan for zero pinned cache blocks (the
lazy-return rule).  The output states facts; the judgment stays human.

Usage: python tools/scan_audit.py [--names a,b] [--limit N]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def audit_entry(spark, fn, sf_dir: str) -> tuple[int, int, bool]:
    """Return (n_scans, n_distinct_paths, cached) for one entry's
    physical plan.  ``cached`` entries are excluded from the ranked
    excess list: a cached relation's build plan prints inline once per
    consuming branch (and AQE prints it twice more as Initial/Final
    sections) but executes at most once, so the textual scan count
    wildly overstates — an eager_cache'd pipeline shows 181 nominal
    scans for what executes as one.  For cache-free plans the count is
    exact: each printed FileScan is a real execution branch."""
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    paths = set(re.findall(r"InMemoryFileIndex(?:\(\d+ paths?\))?\[([^\],]+)", plan))
    return n_scans, max(len(paths), 1), "InMemoryRelation" in plan


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", help="comma-separated entry names (default: all)")
    ap.add_argument("--limit", type=int, default=0, help="stop after N entries")
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
    rows, cached = [], []
    for name in names:
        try:
            n_scans, n_paths, is_cached = audit_entry(
                spark, CATALOG[name].fn, SF_DIR
            )
        except Exception as e:  # entry needs an environment this sweep lacks
            print(f"SKIP   {name}: {str(e)[:80]}")
            continue
        if is_cached:
            cached.append(name)
            continue
        excess = n_scans - n_paths
        rows.append((excess, n_scans, n_paths, name))
        if excess > 0:
            print(f"EXCESS {name}: {n_scans} scans over {n_paths} path(s)")
    rows.sort(reverse=True)
    print("\n== top excess-scan entries (cache-free plans; count exact) ==")
    for excess, n_scans, n_paths, name in rows[:25]:
        print(f"{excess:3d} excess  {n_scans:3d} scans / {n_paths} paths  {name}")
    print(
        f"\n== cached plans (textual count meaningless; review manually): "
        f"{len(cached)} ==\n" + ", ".join(cached)
    )


if __name__ == "__main__":
    main()
