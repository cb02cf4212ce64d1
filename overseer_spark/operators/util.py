"""Shared operator plumbing."""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input so per-row-heavy work parallelizes.

    Small single-file parquet inputs arrive as ONE partition, serializing
    every downstream higher-order-function/UDF on one core. At lakehouse
    scale inputs are already many splits and this is a no-op; locally it
    buys cores-× speedup for CPU-bound column work. Hash-partitioning on the
    id also pre-aligns later groupBy/join shuffles on that key.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)


def grouped_apply_batched(
    df: DataFrame,
    keys: list[str],
    fn: Callable,
    schema: str,
    num_partitions: int | None = None,
    per_group: bool = True,
) -> DataFrame:
    """``groupBy(keys).applyInPandas(fn, schema)`` semantics, batched.

    ``applyInPandas`` ships one Arrow batch per *group*; with many small
    groups (the common shape for per-user / per-doc normalization) the
    per-group round trip dominates — milliseconds of overhead for
    microseconds of work. Here rows are hash-partitioned and sorted by the
    keys, then a single ``mapInPandas`` runs a pandas ``groupby`` inside
    each Arrow batch, carrying the possibly-incomplete trailing group over
    to the next batch. One Python round trip per batch (~10k rows), not per
    group; memory stays bounded by batch size + one group.

    ``per_group=False`` goes one step further for vectorizable kernels:
    ``fn`` receives the whole batch (complete groups only, sorted by keys)
    and handles grouping itself — e.g. pandas ``groupby().transform``,
    which stays in Cython instead of a Python loop over thousands of tiny
    group frames. Use it whenever the kernel is expressible as
    transform/agg; keep ``per_group=True`` for genuinely per-group logic.
    """
    import pandas as pd

    def apply_complete(head: pd.DataFrame) -> pd.DataFrame:
        if per_group:
            return pd.concat(
                [fn(g) for _, g in head.groupby(keys, sort=False)], ignore_index=True
            )
        return fn(head)

    def run(batches):
        carry: pd.DataFrame | None = None
        for b in batches:
            if carry is not None and len(carry):
                b = pd.concat([carry, b], ignore_index=True)
            if not len(b):
                continue
            # rows are sorted by keys, so the last group is a contiguous tail;
            # hold it back — its remaining rows may arrive in the next batch
            last = b[keys].iloc[-1]
            tail_mask = (b[keys] == last).all(axis=1)
            carry = b[tail_mask]
            head = b[~tail_mask]
            if len(head):
                yield apply_complete(head)
        if carry is not None and len(carry):
            yield apply_complete(carry)

    parted = df.repartition(
        num_partitions or df.sparkSession.sparkContext.defaultParallelism, *keys
    ).sortWithinPartitions(*keys)
    return parted.mapInPandas(run, schema=schema)


def eager_cache(df: DataFrame) -> DataFrame:
    """Cache AND materialize now (one cheap count action).

    A lazy ``.cache()`` under a self-join (or any plan reading the cached
    subtree from several branches) is a trap: the first action computes the
    branches concurrently, each missing the still-empty cache, so the
    expensive subtree runs 2-3×. Materializing first costs one scheduling
    round trip and makes every branch a cache hit — measured ~2× end-to-end
    on the MinHash pipeline.
    """
    df = df.cache()
    df.count()
    return df


@contextmanager
def dimension_loop_conf(spark, shuffle_partitions: int | None = None):
    """Scoped runtime conf for ITERATIVE loops over dimension-sized
    relations (BPE merge rounds, LPA label rounds, Lloyd iterations —
    vocab-/node-/centroid-sized frames that a loop re-aggregates many
    times).

    AQE's per-query-stage materialize-and-replan cycle costs a fixed
    ~0.5 s of driver work per action (measured r12: 10 trivial
    aggregate actions = 6.8 s with AQE on, and the 11-action BPE chain
    dropped 11.2 s → 4.5 s with AQE off + 1 shuffle partition at
    sf0.1) — pure overhead when every shuffle in the loop is KNOWN to
    be dimension-sized, because there is nothing for AQE to re-plan:
    no skew to split, nothing worth coalescing, no join small enough
    to convert that the static planner didn't already broadcast. The
    corpus-sized scan that PRODUCES the dimension relation must run
    OUTSIDE this scope (materialize it with eager_cache first) so it
    keeps AQE's coalescing/skew handling.

    ``shuffle_partitions=None`` leaves the session's shuffle
    parallelism untouched (right for loops whose per-round shuffles
    scale with a query batch); an explicit small value (e.g. 1) suits
    relations that are one-or-few partitions by construction — a
    production vocab is ~1e6 rows / ~100 MB. Join strategy inside the
    scope must not depend on AQE's runtime conversion: hint the
    batch-bounded side with F.broadcast explicitly. Previous conf
    values are restored on exit (including unset → unset).

    Concurrency (ADVICE r12): runtime conf is SESSION-global, so the
    scope assumes no concurrent query on the same session — true for
    every current caller (catalog entries run their loops serially on
    one driver thread; the streaming entries invoke it from inside
    foreachBatch, whose micro-batches are serialized by the engine).
    Nesting is tolerated: a key already holding its target value is
    left alone (not set, not restored), so an inner scope cannot
    clobber the outer scope's restore order."""
    confs = {"spark.sql.adaptive.enabled": "false"}
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    old: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            cur: str | None = spark.conf.get(k)
        except Exception:
            cur = None
        if cur == v:  # nested scope (or ambient equal conf): leave untouched
            continue
        old[k] = cur
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
