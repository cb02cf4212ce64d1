"""One-pass observed metrics: data-quality gates that ride the main scan.

A pipeline gate like q_data_profile answers "is this load sane?" with its
own aggregation pass. ``DataFrame.observe`` attaches the same aggregates to
an EXISTING action as a side channel — the write/count that was happening
anyway also yields row counts, null counts, and bounds, with zero extra
scans and zero extra shuffles. At 100 TB that's the difference between a
free gate and a second pass over the table.

Used by handlers as: ``df, obs = with_quality_metrics(df, ...); sink(df);
check(obs.get)`` — validate-after-materialize, abort the job (X7 tagged
exceptions) if the gate fails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame,
    not_null: list[str] | None = None,
    bounds: dict[str, tuple[float, float]] | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / bound-violation metrics to df.

    Returns (df, observation); read ``observation.get`` AFTER the first
    action on df. Metrics are plain aggregate expressions evaluated by the
    existing job — Spark merges per-task partials on the driver.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    for c, (lo, hi) in (bounds or {}).items():
        metrics.append(
            F.sum(((F.col(c) < lo) | (F.col(c) > hi)).cast("long")).alias(
                f"oob_{c}"
            )
        )
    return df.observe(obs, *metrics), obs


def gate(observation: Observation, max_null_frac: float = 0.0, max_oob: int = 0) -> None:
    """Raise ``ValueError`` if observed metrics violate the gate."""
    m = observation.get
    n = m.get("n_rows", 0) or 0
    for k, v in m.items():
        if k.startswith("nulls_") and n and (v or 0) / n > max_null_frac:
            raise ValueError(f"quality gate: {k}={v} of {n} rows")
        if k.startswith("oob_") and (v or 0) > max_oob:
            raise ValueError(f"quality gate: {k}={v}")
