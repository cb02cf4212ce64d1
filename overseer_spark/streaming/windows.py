"""Event-time window transformations — written once, runnable on BOTH a
batch DataFrame and a streaming DataFrame (the Structured Streaming
contract). Batch parity is what the SQL-tier oracle checks (Q30/sessionize);
the streaming path adds watermarks for state cleanup + late-data drop.

Scale notes: event-time windowed aggregation shuffles on (window, keys);
the watermark bounds state size, which is what makes these viable on an
unbounded 100 TB/day stream. ``availableNow`` triggers give incremental
batch over the same code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-window count + sum (Q30). With ``watermark`` set (streaming),
    late rows beyond the delay are dropped and window state is purged."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration).alias("win"), *keys).agg(
        F.count(F.lit(1)).alias("c"), F.round(F.sum(value_col), 2).alias("s")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    keys: tuple[str, ...] = (),
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Hopping windows (each event lands in duration/slide windows). One
    definition serves the batch oracle (sliding_window_counts) and the
    streaming path (stream_sliding_counts)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("c")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("s"))
    return df.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys).agg(*aggs)


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    keys: tuple[str, ...] = ("user_id",),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows with a fixed inactivity gap (Q40). In streaming,
    session state merges windows as events arrive; the watermark finalizes
    sessions older than the delay."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys).agg(
        F.count(F.lit(1)).alias("n_events")
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming ingest dedup: emit the FIRST row per key, suppress
    re-arrivals within the watermark horizon (``dropDuplicatesWithinWatermark``).

    This is the streaming twin of exact dedup (Q35) for a crawl/ingest
    pipeline: state holds one entry per key only until the watermark passes
    its event time + ``delay``, so state is bounded by arrival skew, not by
    corpus size — the property that makes it runnable forever. A duplicate
    arriving later than ``delay`` after the original is NOT suppressed
    (documented at-least-once seam; downstream batch dedup_exact_groups is
    the idempotent backstop).
    """
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
