"""Funnel analysis: per-key sequential step completion over an event
stream — "of the users who did A, how many later did B, then C?".

One shuffle total: events collect per user (sorted structs), then a single
``aggregate`` fold walks the timeline carrying ``(depth, last_ts)`` state —
step k counts only if it happens strictly after step k-1's completion.
This is the per-row HOF pattern (cf. dedup signatures): the alternative —
one join+agg per funnel step — costs k shuffles and rescans the event
table k times.

At 100 TB the collect_list per user is bounded by per-user event counts
(the natural partition key); pathological hot users are exactly what
operators/skew.py's salting addresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_depths(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, depth): how far down ``steps`` each user got, in order, with
    strictly increasing timestamps. depth=0 means the user never did
    steps[0]."""
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    evs = F.array_sort(F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))))
    zero = F.struct(
        F.lit(0).alias("depth"), F.lit(None).cast("timestamp").alias("last_ts")
    )
    fold = lambda acc, x: F.when(  # noqa: E731
        (acc["depth"] < k)
        & (x["et"] == F.element_at(steps_arr, acc["depth"] + 1))
        & ((acc["depth"] == 0) | (x["ts"] > acc["last_ts"])),
        F.struct((acc["depth"] + 1).alias("depth"), x["ts"].alias("last_ts")),
    ).otherwise(acc)
    per_user = (
        events.select(user_col, type_col, ts_col)
        .groupBy(user_col)
        .agg(evs.alias("_evs"))
        .select(
            F.col(user_col),
            F.aggregate("_evs", zero, fold)["depth"].alias("depth"),
        )
    )
    return per_user


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(depth, n_users) — the funnel report: n_users at each reached depth
    (0 .. len(steps))."""
    return (
        funnel_depths(events, steps, user_col, type_col, ts_col)
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("depth")
    )
