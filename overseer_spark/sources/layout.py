"""Data-layout optimization: clustered / Z-ordered writes for scan pruning.

At 100 TB the cheapest query is the one that never reads most of the table.
Parquet keeps min/max statistics per row group; Spark (and every other
parquet reader) skips row groups whose stats exclude the filter predicate.
Whether that skipping *does* anything is purely a layout property:

- **range clustering** (``write_clustered``): ``repartitionByRange`` on the
  cluster columns + ``sortWithinPartitions`` → row-group min/max ranges are
  disjoint along those columns, so a point/range filter touches O(selectivity)
  row groups instead of all of them. Best for one dominant filter column.
- **Z-ordering** (``write_zordered``): interleave the bits of per-column
  quantile ranks into one integer key and range-sort by it. Locality is
  preserved across ALL the keyed columns at once, so filters on either (or
  both) columns prune — the standard multi-dimensional lakehouse layout
  (same construction as Delta/Iceberg OPTIMIZE ZORDER, built here from
  plain Spark expressions).

Rank computation uses driver-side ``approxQuantile`` cut points (k values,
independent of table size) applied map-side via a small array HOF — no
global window, no extra shuffle beyond the final range sort that any
clustered write needs. ``pruning_stats`` measures the payoff directly from
parquet footers (pyarrow, driver-side metadata read — no data scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    rows_per_rowgroup: int | None = None,
) -> None:
    """Range-cluster ``df`` on ``cluster_cols`` and write parquet.

    Files (and row groups within them) end up covering disjoint ranges of
    the cluster columns, so predicate pushdown on those columns skips
    whole row groups/files. One range shuffle — the unavoidable cost of
    any global clustering.
    """
    out = df.repartitionByRange(num_files, *cluster_cols).sortWithinPartitions(
        *cluster_cols
    )
    writer = out.write.mode("overwrite")
    if rows_per_rowgroup:
        writer = writer.option("parquet.block.size", rows_per_rowgroup)
    writer.parquet(path)


def _rank_expr(col: str, cuts: list[float]) -> Column:
    """Map-side quantile rank: #cut-points ≤ value (0..len(cuts))."""
    arr = F.array(*[F.lit(c) for c in cuts])
    return F.size(F.filter(arr, lambda b: b <= F.col(col).cast("double")))


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, relative_error: float = 0.001
) -> Column:
    """Z-order (Morton) key over ``cols`` as a Spark Column.

    Each column is reduced to a ``bits``-bit quantile rank (cut points from
    ``approxQuantile`` — a driver action returning 2^bits doubles, table-size
    independent), then ranks are bit-interleaved. All arithmetic is plain
    long expressions inside whole-stage codegen.
    """
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    ranks = []
    for c in cols:
        cuts = df.approxQuantile(c, qs, relative_error)
        ranks.append(_rank_expr(c, cuts).cast("long"))
    ncols = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * ncols + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Z-order ``df`` on ``zorder_cols`` and write parquet.

    Range-partition + sort on the interleaved key: row groups become
    hyper-rectangles in rank space, so min/max stats prune on every keyed
    column, not just a leading one.
    """
    keyed = df.withColumn("_zkey", zorder_key(df, zorder_cols, bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def pruning_stats(
    spark: SparkSession,
    path: str,
    predicates: dict[str, tuple[float, float]],
) -> dict[str, int]:
    """How much a layout lets a range predicate skip, from parquet footers.

    ``predicates`` maps column → (lo, hi) inclusive. A row group *matches*
    when every predicate interval overlaps its [min, max] stats — i.e. a
    reader must scan it. Returns ``{"row_groups_total": N,
    "row_groups_matching": M}``; a good layout drives M/N toward the true
    selectivity. Footer-only (pyarrow): no row data is read.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    total = matching = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        for rg in range(meta.num_row_groups):
            total += 1
            group = meta.row_group(rg)
            hit = True
            for col, (lo, hi) in predicates.items():
                idx = schema_names.index(col)
                st = group.column(idx).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats → reader must scan
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            matching += int(hit)
    return {"row_groups_total": total, "row_groups_matching": matching}
