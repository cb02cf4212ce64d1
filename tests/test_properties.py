"""Property-based tests (hypothesis): operator laws checked against pure-
Python reference implementations on randomized small inputs. Complements the
fixed-fixture oracle parity — these explore edge shapes (all-null columns,
single-row groups, boundary gaps) that curated fixtures miss.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# one example = one Spark job; keep the sample count deliberate
_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user_id
        st.integers(min_value=0, max_value=10_000),  # ts offset seconds
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, width=32)),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_events)
@settings(**_SETTINGS)
def test_forward_fill_matches_scan_and_is_idempotent(spark, rows):
    """Forward fill == a per-user chronological scan carrying the last
    non-null value; filling an already-filled column is a no-op."""
    data = [
        (i, u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts), v)
        for i, (u, ts, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, schema="event_id long, user_id long, ts timestamp, v double"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = df.withColumn("f", F.last("v", ignorenulls=True).over(w))
    got = {r.event_id: r.f for r in filled.collect()}

    expected = {}
    carry: dict[int, float | None] = {}
    for i, u, ts, v in sorted(data, key=lambda t: (t[1], t[2], t[0])):
        if v is not None:
            carry[u] = v
        expected[i] = carry.get(u)
    assert got == pytest.approx(expected)

    refill = filled.withColumn("f2", F.last("f", ignorenulls=True).over(w))
    assert all(
        (r.f is None and r.f2 is None) or r.f == r.f2 for r in refill.collect()
    ), "forward fill must be idempotent"


@given(rows=_events)
@settings(**_SETTINGS)
def test_session_window_count_matches_gap_scan(spark, rows):
    """session_window(5 min) produces exactly (#gaps ≥ 5 min) + 1 sessions
    per user — the lag/cumsum identity the sessionize oracle relies on."""
    data = [
        (i, u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts))
        for i, (u, ts, _) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, schema="event_id long, user_id long, ts timestamp")
    sess = (
        df.groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("sessions"))
    )
    got = {r.user_id: r.sessions for r in sess.collect()}

    by_user: dict[int, list[datetime.datetime]] = {}
    for _, u, ts in data:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        tss.sort()
        gaps = sum(
            1
            for a, b in zip(tss, tss[1:])
            if (b - a) >= datetime.timedelta(minutes=5)
        )
        assert got[u] == gaps + 1, (u, tss)

    # every event lands in exactly one session
    total = (
        df.groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == len(data)


_docs = st.lists(
    st.lists(
        st.sampled_from("aa bb cc dd ee ff gg hh".split()),
        min_size=0,
        max_size=12,
    ),
    min_size=2,
    max_size=8,
)


def _shingles(words, k=3):
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


@given(docs=_docs)
@settings(**_SETTINGS)
def test_jaccard_and_containment_prefix_filters_are_exact(spark, docs):
    """The PPJoin-style prefix filters (two-sided for Jaccard, one-sided
    for containment) must return EXACTLY the brute-force pair sets — on
    random tiny corpora with heavy shingle collisions, the worst case for
    candidate pruning."""
    from overseer_spark.operators import dedup as D

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = {i: _shingles(ws) for i, ws in rows_to_words(docs)}
    exp_jac, exp_cont = set(), set()
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sh[ids[x]], sh[ids[y]]
            if not a or not b:
                continue
            inter = len(a & b)
            if inter and inter / len(a | b) >= 0.8:
                exp_jac.add((ids[x], ids[y]))
            if inter and inter / min(len(a), len(b)) >= 0.9:
                exp_cont.add((ids[x], ids[y]))

    got_jac = {(r.d1, r.d2) for r in D.jaccard_pairs(df, threshold=0.8).collect()}
    got_cont = {
        (r.d1, r.d2) for r in D.containment_pairs(df, threshold=0.9).collect()
    }
    assert got_jac == exp_jac
    assert got_cont == exp_cont


def rows_to_words(docs):
    return [(i, ws) for i, ws in enumerate(docs)]
