"""Funnel fold semantics on crafted event sequences: ordering, strictness
(step k must be strictly after step k-1), and out-of-order arrivals."""

from __future__ import annotations

from datetime import datetime

from overseer_spark.operators.funnel import funnel_counts, funnel_depths


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, 1, 0, 0, s)) for u, t, s in rows],
        schema="user_id long, event_type string, ts timestamp",
    )


def test_depths(spark):
    df = _ev(
        spark,
        [
            # u1 completes the funnel, events arrive out of order
            (1, "purchase", 30),
            (1, "view", 10),
            (1, "click", 20),
            # u2: click BEFORE view — depth stops at 1 (view only)
            (2, "click", 5),
            (2, "view", 6),
            # u3: view and click same second — strictness rejects the click
            (3, "view", 7),
            (3, "click", 7),
            # u4: never views
            (4, "purchase", 1),
        ],
    )
    got = {
        r["user_id"]: r["depth"]
        for r in funnel_depths(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1, 4: 0}


def test_counts(spark):
    df = _ev(spark, [(1, "view", 1), (1, "click", 2), (2, "view", 1), (3, "error", 1)])
    got = {
        r["depth"]: r["n_users"]
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1}


def test_repeat_events_use_earliest_qualifying(spark):
    """A second 'view' after the click must not reset progress."""
    df = _ev(
        spark,
        [(1, "view", 1), (1, "click", 2), (1, "view", 3), (1, "purchase", 4)],
    )
    got = funnel_depths(df, ["view", "click", "purchase"]).collect()
    assert got[0]["depth"] == 3
