"""Shared operator plumbing."""

from __future__ import annotations

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
