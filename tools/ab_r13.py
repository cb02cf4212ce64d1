"""Interleaved A/B harness for round-13 adjudications.

The box drifts ±1.5x within an afternoon (3.3x documented intra-box
spread), so per docs/VERIFY.md a perf claim is only valid from an
INTERLEAVED A/B in one session: variants alternate rep by rep, so any
box phase hits every variant equally. Variants are monkeypatches applied
around the entry call; results go to stdout as one JSON line per rep
plus a min-per-variant summary.

Usage:
    python tools/ab_r13.py stream_ann_ingest --reps 4
    python tools/ab_r13.py near_dup_keep_best --reps 4
    python tools/ab_r13.py isolate hard_negative_mining retrieval_ndcg_eval \
        --reps 3   # plain isolated min-of-N (no variants) for noise adjudication
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from contextlib import contextmanager

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, fn, label: str) -> float:
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    _noop(fn(spark, SF_DIR))
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return dt


# ---------------------------------------------------------------- variants

@contextmanager
def _patch_dim_conf(mode):
    """mode: 'cur' (no patch), 'aqe_on' (scope becomes a no-op),
    'sp1'/'sp4' (force an explicit small shuffle width into every scope
    that did not set one)."""
    from overseer_spark.operators import util as U

    orig = U.dimension_loop_conf
    if mode == "cur":
        yield
        return

    if mode == "aqe_on":
        @contextmanager
        def patched(spark, shuffle_partitions=None):
            yield
    else:
        width = int(mode[2:])

        @contextmanager
        def patched(spark, shuffle_partitions=None):
            with orig(spark, shuffle_partitions=shuffle_partitions or width):
                yield

    U.dimension_loop_conf = patched
    try:
        yield
    finally:
        U.dimension_loop_conf = orig


_MEMBER_COLS = ["doc_id", "n", "q_int", "component"]


@contextmanager
def _patch_near_dup(mode):
    """mode: 'cur' (lazy cache), 'nocache', 'eager', 'ckpt'. Patches
    DataFrame.cache but alters ONLY the member frame (matched by its
    4-column schema) — the jaccard/components internals' caches, which
    earlier A/Bs adjudicated separately, keep their current behavior."""
    import pyspark.sql.dataframe as DFM

    if mode == "cur":
        yield
        return
    orig = DFM.DataFrame.cache

    def patched(self):
        if self.columns != _MEMBER_COLS:
            return orig(self)
        if mode == "nocache":
            return self
        if mode == "eager":
            out = orig(self)
            out.count()
            return out
        return self.localCheckpoint(eager=True)  # ckpt

    DFM.DataFrame.cache = patched
    try:
        yield
    finally:
        DFM.DataFrame.cache = orig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("extra", nargs="*")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--variants", default=None,
                    help="comma list; default depends on target")
    args = ap.parse_args()

    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.session import get_spark

    spark = get_spark("ab-r13")
    spark.sparkContext.setLogLevel("ERROR")

    if args.target == "isolate":
        names = args.extra
        for n in names:  # warmup once each
            _timed(spark, CATALOG[n].fn, f"warmup {n}")
        out = {}
        for rep in range(args.reps):
            for n in names:  # interleave entries too
                dt = _timed(spark, CATALOG[n].fn, f"{n} rep{rep}")
                out.setdefault(n, []).append(round(dt, 3))
                print(json.dumps({"entry": n, "rep": rep, "sec": round(dt, 3)}),
                      flush=True)
        print(json.dumps({"summary": {n: min(v) for n, v in out.items()},
                          "all": out}))
        spark.stop()
        return

    name = args.target
    fn = CATALOG[name].fn
    if name == "near_dup_keep_best":
        patcher, default_variants = _patch_near_dup, "cur,nocache,eager,ckpt"
    else:
        patcher, default_variants = _patch_dim_conf, "cur,aqe_on,sp4"
    variants = (args.variants or default_variants).split(",")

    def run_variant(v: str, label: str) -> float:
        # "wrapN" runs the WHOLE entry (build + actions) under
        # dimension_loop_conf(spark, N) — AQE off and an explicit small
        # shuffle width for every action the entry drives, including the
        # beam-serve loop that currently keeps AQE
        if v.startswith("wrap"):
            from overseer_spark.operators.util import dimension_loop_conf
            width = int(v[4:]) if len(v) > 4 else None
            with dimension_loop_conf(spark, width):
                return _timed(spark, fn, label)
        with patcher(v):
            return _timed(spark, fn, label)

    _timed(spark, fn, f"warmup {name}")  # one warm pass (codegen, artifacts)
    results: dict[str, list[float]] = {v: [] for v in variants}
    rows = None
    for rep in range(args.reps):
        for v in variants:
            dt = run_variant(v, f"{name} {v} rep{rep}")
            results[v].append(round(dt, 3))
            print(json.dumps({"variant": v, "rep": rep, "sec": round(dt, 3)}),
                  flush=True)
            # equality witness on the last rep: variants must not change rows
            if rep == args.reps - 1:
                got = sorted(map(str, fn(spark, SF_DIR).collect()))
                if rows is None:
                    rows = got
                elif got != rows:
                    print(json.dumps({"MISMATCH": v}))
                    sys.exit(1)
    print(json.dumps({"summary": {v: min(r) for v, r in results.items()},
                      "rows_equal": True, "all": results}))
    spark.stop()


if __name__ == "__main__":
    main()
