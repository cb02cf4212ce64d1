"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need splits that are (a) reproducible across runs
and engines, (b) stable under repartitioning, and (c) computable without a
shuffle. ``F.rand(seed)`` fails (a)/(b): it is seeded *per partition*, so
the same row lands in a different split whenever the scan parallelism
changes. Instead we hash a key column (md5 → first 8 hex chars → int) so
membership is a pure function of the row — the same trick TPC data
generators and tf.data's ``hash_split`` use. The reference's only sampling
is `rand-nth` pick-one (reference executor.clj:69, mapped as R13); these
operators are the scale-out generalization for dataset curation.

Everything is a narrow projection (no shuffle, no UDF): md5 + conv stay
inside whole-stage codegen, so a 100 TB split is a single scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^8 buckets from the first 8 hex chars of md5
_BUCKETS = 16**8


def hash_bucket(key: Column | str, *, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, 1) from a key column.

    ``conv(substr(md5(k), 1, 8), 16, 10) / 16^8`` — portable: DuckDB
    spells it ``from_hex``/``hash`` differently but md5 hex agrees
    byte-for-byte, which is what the oracle queries rely on.
    """
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_BUCKETS)


def hash_split(
    df: DataFrame,
    key: str,
    *,
    test_fraction: float = 0.125,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Tag each row 'train' / 'test' by deterministic key hash.

    Rows with equal keys always land in the same split (leakage-safe for
    duplicated documents); changing ``salt`` re-deals the split.
    """
    b = hash_bucket(key, salt=salt)
    return df.withColumn(
        split_col, F.when(b < test_fraction, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float] | float,
    key: str,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum subsample by key hash.

    ``fractions`` is either one global fraction or {stratum: fraction};
    strata absent from the dict keep fraction 0.0 (dropped). Unlike
    ``DataFrame.sampleBy`` this is reproducible across partitionings and
    engines, and it needs no shuffle — it's a filter.
    """
    b = hash_bucket(key, salt=salt)
    if isinstance(fractions, dict):
        frac = F.lit(0.0)
        for stratum, f in sorted(fractions.items()):
            frac = F.when(F.col(strata_col) == stratum, F.lit(float(f))).otherwise(frac)
    else:
        frac = F.lit(float(fractions))
    return df.filter(b < frac)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    salt: str = "s42",
    id_col: str = "doc_id",
    key_round: int = 8,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006): each row gets key = ln(u) / w with u a per-row uniform
    derived from md5(id:salt); the k largest keys ARE a weight-proportional
    sample. Changing ``salt`` redraws the sample — epochs are reproducible
    and engine-portable (the same md5 arithmetic runs in the DuckDB
    oracle).

    Scale shape: key assignment is one stateless projection; selection is
    a top-k (TakeOrderedAndProject — per-partition heaps, no global sort).
    Output: (id, weight, sample_key) sorted by id.
    """
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    u = hv / F.lit(float(1 << 48))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            F.round(key, key_round).alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), id_col)
        .limit(k)
        .orderBy(id_col)
    )
