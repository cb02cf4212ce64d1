"""Sequence packing: bin documents into fixed-token context windows.

Training pipelines pack variable-length documents into fixed-capacity
sequences (context windows) to avoid padding waste. Optimal bin packing is
NP-hard and inherently serial; the scalable formulation packs each
partition independently with first-fit-decreasing (FFD, ≤ 11/9·OPT + 1),
namespacing pack ids by partition — zero coordination, so 100 TB packs as
a single map-side pass after one hash repartition.

Determinism: rows are hash-partitioned by id (a pure function of the key
and partition count) and FFD processes them in (size desc, id) order, so
the same corpus always yields the same packs regardless of input layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pack_id = partition_id * _PART_STRIDE + local pack index
_PART_STRIDE = 1 << 32


def pack_greedy(
    df: DataFrame,
    capacity: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign a ``pack_id`` to every row such that each pack's total
    ``size_col`` ≤ capacity (rows larger than capacity get a singleton
    pack — the caller chunks them first; see text.chunk).

    Output: (id, size, pack_id, pack_slot) — pack_slot is the row's
    position within its pack, so downstream concatenation is ordered.
    """
    import pandas as pd

    def ffd(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        frames = list(batches)
        if not frames:
            return
        rows = pd.concat(frames, ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values([size_col, id_col], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per open pack
        out_pack, out_slot = [], []
        counts: list[int] = []  # rows already in each pack
        for sz in rows[size_col].to_list():
            placed = -1
            for j, rem in enumerate(bins):  # first fit
                if sz <= rem:
                    placed = j
                    break
            if placed < 0:
                bins.append(max(capacity - sz, 0))
                counts.append(1)
                placed = len(bins) - 1
                out_slot.append(0)
            else:
                bins[placed] -= sz
                counts[placed] += 1
                out_slot.append(counts[placed] - 1)
            out_pack.append(pid * _PART_STRIDE + placed)
        yield pd.DataFrame(
            {
                id_col: rows[id_col].to_list(),
                size_col: rows[size_col].to_list(),
                "pack_id": out_pack,
                "pack_slot": out_slot,
            }
        )

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.select(id_col, size_col).repartition(n, id_col)
    id_t = df.schema[id_col].dataType.simpleString()
    sz_t = df.schema[size_col].dataType.simpleString()
    return parted.mapInPandas(
        ffd, schema=f"{id_col} {id_t}, {size_col} {sz_t}, pack_id long, pack_slot int"
    )


def pack_greedy_sharded(
    df: DataFrame,
    capacity: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """First-fit-decreasing packing per EXPLICIT shard — the
    layout-independent variant of :func:`pack_greedy`.

    ``pack_greedy`` shards by physical partition (defaultParallelism +
    TaskContext ids), so the same corpus packs differently on an 8-core
    laptop and a 1000-executor cluster. Here the shard is a pure function
    of the row: ``pmod(xxhash64(id), n_shards)``, packed via
    groupBy(shard).applyInPandas — identical output for ANY partition
    layout, core count, or input order. That reproducibility is the
    point: packed sequences feed training, and a training run's data
    order should not depend on the cluster that prepared it. Same
    invariants (fill ≤ 1, every row packed once, oversize rows get
    singleton packs); pack_id = shard * 2^32 + local index.
    """
    import pandas as pd

    def ffd(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        shard = int(key[0])
        rows = pdf.sort_values([size_col, id_col], ascending=[False, True])
        bins: list[int] = []
        counts: list[int] = []
        out_pack, out_slot = [], []
        for sz in rows[size_col].to_list():
            placed = -1
            for j, rem in enumerate(bins):  # first fit
                if sz <= rem:
                    placed = j
                    break
            if placed < 0:
                bins.append(max(capacity - sz, 0))
                counts.append(1)
                placed = len(bins) - 1
                out_slot.append(0)
            else:
                bins[placed] -= sz
                counts[placed] += 1
                out_slot.append(counts[placed] - 1)
            out_pack.append(shard * _PART_STRIDE + placed)
        return pd.DataFrame(
            {
                id_col: rows[id_col].to_list(),
                size_col: rows[size_col].to_list(),
                "pack_id": out_pack,
                "pack_slot": out_slot,
            }
        )

    id_t = df.schema[id_col].dataType.simpleString()
    sz_t = df.schema[size_col].dataType.simpleString()
    return (
        df.select(
            id_col,
            size_col,
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("_shard"),
        )
        .groupBy("_shard")
        .applyInPandas(
            ffd,
            schema=(
                f"{id_col} {id_t}, {size_col} {sz_t}, "
                "pack_id long, pack_slot int"
            ),
        )
    )


def packing_stats(packed: DataFrame, capacity: int, size_col: str = "n_tokens") -> DataFrame:
    """One-row packing report: packs, rows, mean fill ratio, waste."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum(size_col).alias("used"), F.count(F.lit(1)).alias("rows")
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("rows").alias("n_rows"),
        F.round(F.avg(F.col("used") / capacity), 4).alias("mean_fill"),
        F.sum(F.lit(capacity) - F.col("used")).alias("wasted_tokens"),
    )
