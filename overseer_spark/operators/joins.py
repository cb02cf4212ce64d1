"""Join operators Spark lacks natively.

``asof_join``: for each left row, the most recent right row with
``right_ts <= left_ts`` within the same ``by`` keys (direction="backward").
Spark has no ASOF JOIN; the naive range-join (``l.ts >= r.ts`` + window on
the pair blow-up) is O(|L|·|R|) per key. This implementation is the
union+last-value pattern: union both sides on the (by, ts) axis, one window
pass carries the latest right payload forward, keep left rows — cost is a
single sort/shuffle of |L|+|R| rows on ``by``, which scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    tolerance_us: int,
    by: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Pairs with ``|left.ts − right.ts| ≤ tolerance`` within ``by`` keys.

    A raw theta join degenerates to a per-key cross product. Instead both
    sides bucket on ``floor(epoch_us / tolerance)``; any qualifying pair is
    at most one bucket apart, so the right side replicates into its three
    adjacent buckets and the join becomes an equi-join on (by, bucket) with
    an exact residual filter — linear shuffle, no nested loop.
    """
    by = by or []
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    bucket = (us(on) / F.lit(tolerance_us)).cast("long")
    l = left.withColumn("_bkt", bucket)
    r = right.select(
        *[F.col(c).alias(c + suffix if c not in by else c) for c in right.columns]
    ).withColumn(
        "_bkt",
        F.explode(
            F.array(
                (us(on + suffix) / tolerance_us).cast("long") - 1,
                (us(on + suffix) / tolerance_us).cast("long"),
                (us(on + suffix) / tolerance_us).cast("long") + 1,
            )
        ),
    )
    residual = (
        F.abs(us(on) - us(on + suffix)) <= tolerance_us
    )
    return l.join(r, on=by + ["_bkt"], how="inner").filter(residual).drop("_bkt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join. ``on`` = ordering column (same name both sides);
    ``by`` = equality partition keys; ``right_cols`` = right payload columns
    to carry (default: all non-key columns), renamed with ``suffix``.
    Left rows with no prior right row get NULL payloads (left-outer
    semantics, matching ASOF LEFT JOIN).
    """
    by = by or []
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    out_names = [c + suffix for c in right_cols]

    l_tag = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n) for c, n in zip(right_cols, out_names)],
        *[F.col(c) for c in left.columns if c not in by and c != on],
    )
    r_tag = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts iff exact matches count
    side_order = F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, -1 if not allow_exact_matches else 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(n, ignorenulls=True).over(w).alias(n + "_c")
            for n in out_names
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *by,
            F.col(on),
            *[F.col(c) for c in left.columns if c not in by and c != on],
            *[F.col(n + "_c").alias(n) for n in out_names],
        )
    )
