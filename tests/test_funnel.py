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


def test_markov_attribution_linear_chain_reference(spark, tmp_path):
    """On a corpus where every journey is view→click→purchase, removing
    EITHER view or click must zero conversion: removal effects equal,
    credits 0.5/0.5, base conversion 1.0 — the closed-form answer of the
    absorbing-chain algebra."""
    import datetime as dt

    from overseer_spark.queries.catalog import CATALOG

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for u in range(10):
        for j, et in enumerate(["view", "click", "purchase"]):
            rows.append(
                (u * 3 + j, t0 + dt.timedelta(minutes=u * 10 + j), u, et, 1.0, "{}")
            )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {
        r["event_type"]: r
        for r in CATALOG["q_markov_attribution"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"view", "click", "error", "signup"} or set(out) == {"view", "click"}
    assert out["view"]["base_conversion"] == 1.0
    assert out["view"]["removal_effect"] == 1.0
    assert out["click"]["removal_effect"] == 1.0
    assert out["view"]["credit"] == 0.5 and out["click"]["credit"] == 0.5


def test_markov_attribution_properties(spark):
    """Real-corpus invariants: base ∈ (0,1], effects ≥ 0, credits sum
    to 1 (±rounding) and every non-absorbing event type is credited."""
    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_CORRECTNESS

    rows = CATALOG["q_markov_attribution"].fn(spark, SF_CORRECTNESS).collect()
    assert {r["event_type"] for r in rows} == {"view", "click", "error", "signup"}
    base = rows[0]["base_conversion"]
    assert 0.0 < base <= 1.0
    assert all(r["removal_effect"] >= 0.0 for r in rows)
    assert abs(sum(r["credit"] for r in rows) - 1.0) < 0.01
