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
    # cast first: parquet may surface TIMESTAMP_NTZ, which unix_micros rejects;
    # the tz offset introduced by the cast cancels because only differences matter
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
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


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    fpp: float = 0.01,
    exact: bool = True,
) -> DataFrame:
    """Semi-join with a Bloom-filter pre-prune on the probe side.

    The runtime-filter pattern (Spark's own AQE injects the same shape via
    ``spark.sql.optimizer.runtime.bloomFilter.enabled``): hash the build
    side's keys into a bit-packed Bloom bitmap, inline the bitmap into the
    probe's filter expression as an array<long> LITERAL, and let whole-stage
    codegen evaluate k getbit probes per row AT THE SCAN — rows that cannot
    match never reach the exchange. With ``exact=True`` a real left-semi
    join runs after the prune, so the result is exactly the semi-join (the
    bloom only removes shuffle traffic, FPs are re-checked); with
    ``exact=False`` you get the raw pruned stream (superset, no shuffle at
    all) for cases downstream tolerates FPs.

    All hashing is JVM-side ``xxhash64`` double-hashing (Kirsch-
    Mitzenmacher: pos_i = h1 + i·h2 mod m); pmod keeps every product far
    below 2^63 so ANSI mode cannot overflow. The build side's DISTINCT bit
    positions are collected once — k·n ints for n build keys, the same
    driver footprint as Spark's own BloomFilterAggregate result — then
    bit-packed to m/64 longs. Designed for build sides too big to broadcast
    as an IN-list but small enough for a few-hundred-KB bitmap (the classic
    selective-dimension case); at 100 TB the bitmap rides into every task
    as part of the serialized plan, replacing a full shuffle of the probe
    fact.
    """
    import math

    n = max(build.select(build_key).distinct().count(), 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64  # whole words
    k = max(1, round(m / n * math.log(2)))

    def positions(col):
        h1 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m))
        h2 = F.pmod(F.xxhash64(col, F.lit(2)), F.lit(m))
        return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]

    pos_rows = (
        build.select(F.explode(F.array(*positions(F.col(build_key)))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m // 64)
    for r in pos_rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bitmap = F.array(*[F.lit(w).cast("long") for w in signed])

    def bit_set(p):
        word = F.element_at(bitmap, F.floor(p / F.lit(64)).cast("int") + F.lit(1))
        return F.getbit(word, F.pmod(p, F.lit(64))) == 1

    keep = None
    for p in positions(F.col(probe_key)):
        c = bit_set(p)
        keep = c if keep is None else (keep & c)
    pruned = probe.filter(keep)
    if not exact:
        return pruned
    return pruned.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )


def geo_block_candidates(
    df: DataFrame,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_km: float = 500.0,
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """Grid-blocked candidate pairs for a ≤``max_km`` proximity join —
    the geohash-bucketing pattern as a pure EQUI-join (hash-partitionable
    at any scale; a BETWEEN range join would be a nested loop).

    Recall 1.0 by geometry, not by hope: latitude cells are 5°
    (``max_km`` = 500 km ≤ 4.5° of latitude, so ±1 cell always covers
    it), and longitude cells are 10° with ANTIMERIDIAN WRAPPING — at
    |lat| ≤ 60° a 500 km pair can span up to 2·asin(sin(250/6371) /
    cos 60°) ≈ 9.0° of longitude, which a ±1 ring of 5° cells does NOT
    cover (the hazard a property test caught, along with ±180°
    wrap-around pairs: lon 174.9 and −179.9 are the same 5° apart as
    0 and 5).  Neighbor cells are exploded on the probe side and
    wrapped mod 36, so (gy, gx) equality is exact.

    Emits candidate pairs (x, y, alat, alon, blat, blon) with x < y;
    callers verify with exact haversine.  Raises if the configuration
    cannot guarantee total recall."""
    import math

    if max_km > 111.19 * 4.5 or max_abs_lat > 60.0:
        # 5°/10° grid only guarantees recall for this envelope
        raise ValueError(
            "geo_block_candidates guarantees recall for max_km <= 500 "
            "and |lat| <= 60 only; widen the grid for a larger radius"
        )
    lon_span = 2 * math.degrees(
        math.asin(
            min(
                1.0,
                math.sin(max_km / (2 * 6371.0))
                / math.cos(math.radians(max_abs_lat)),
            )
        )
    )
    assert lon_span <= 10.0, "longitude cell must cover the worst-case span"

    g = df.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        F.floor(F.col(lat_col) / 5).cast("long").alias("gy"),
        F.floor(F.col(lon_col) / 10).cast("long").alias("gx"),
    )
    # probe side replicates into its 9 neighbor cells; gx wraps mod 36
    # (cells -18..17) so pairs straddling ±180° still meet on equality
    probe = (
        g.select(
            "id", "lat", "lon",
            F.explode(F.expr("sequence(gy - 1, gy + 1)")).alias("gy"),
            "gx",
        )
        .select(
            "id", "lat", "lon", "gy",
            F.explode(F.expr("sequence(gx - 1, gx + 1)")).alias("gxr"),
        )
        .select(
            "id", "lat", "lon", "gy",
            (F.pmod(F.col("gxr") + 18, F.lit(36)) - 18).alias("gx"),
        )
    )
    a, b = probe.alias("a"), g.alias("b")
    return a.join(
        b,
        (F.col("a.gy") == F.col("b.gy"))
        & (F.col("a.gx") == F.col("b.gx"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("x"),
        F.col("b.id").alias("y"),
        F.col("a.lat").alias("alat"),
        F.col("a.lon").alias("alon"),
        F.col("b.lat").alias("blat"),
        F.col("b.lon").alias("blon"),
    )
