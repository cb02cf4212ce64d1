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
@pytest.mark.slow
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
@pytest.mark.slow
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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# round-2 operator laws
# ---------------------------------------------------------------------------

_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # user
        st.integers(min_value=0, max_value=3000),       # start offset sec
    ),
    min_size=1,
    max_size=20,
)


@given(rows=_intervals)
@settings(**_SETTINGS)
def test_interval_merge_laws(spark, rows):
    """Island merge vs a pure-python sweep: same island count and same
    total covered micros, for 10-minute intervals at random offsets."""
    width = 600  # seconds
    data = [
        (u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s))
        for u, s in rows
    ]
    df = spark.createDataFrame(data, schema="user_id long, ts timestamp")
    iv = df.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"interval {width} seconds")).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max = F.max("e").over(wprev)
    flagged = iv.select(
        "user_id", "s", "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0).alias("ni"),
    )
    m = (
        flagged.select("user_id", "s", "e", F.sum("ni").over(wrun).alias("island"))
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .collect()
    )
    got = {}
    for r in m:
        n, cov = got.get(r.user_id, (0, 0.0))
        got[r.user_id] = (n + 1, cov + (r.me - r.ms).total_seconds())

    want = {}
    by_user: dict[int, list[float]] = {}
    for u, s in rows:
        by_user.setdefault(u, []).append(s)
    for u, starts in by_user.items():
        starts.sort()
        islands = []
        for s in starts:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], s + width)
            else:
                islands.append([s, s + width])
        want[u] = (len(islands), float(sum(e - s for s, e in islands)))
    assert got == want


_sky = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),   # size (maximize)
        st.integers(min_value=0, max_value=8),   # price (minimize)
    ),
    min_size=1,
    max_size=20,
)


@given(rows=_sky)
@settings(**_SETTINGS)
def test_skyline_laws(spark, rows):
    """Skyline membership: no member dominates another member; every
    non-member is dominated by some member (the defining property)."""
    data = [(i, sz, float(pr)) for i, (sz, pr) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, size long, price double")
    per_size = df.groupBy("size").agg(F.min("price").alias("mp_equal"))
    w = Window.orderBy(F.desc("size")).rowsBetween(Window.unboundedPreceding, -1)
    dim = per_size.withColumn("mp_larger", F.min("mp_equal").over(w))
    sky = {
        r.id
        for r in df.join(F.broadcast(dim), "size")
        .where(
            (F.col("mp_larger").isNull() | (F.col("mp_larger") > F.col("price")))
            & (F.col("mp_equal") >= F.col("price"))
        )
        .collect()
    }

    def dominates(a, b):  # a dominates b
        return (
            a[1] >= b[1] and a[2] <= b[2] and (a[1] > b[1] or a[2] < b[2])
        )

    members = [d for d in data if d[0] in sky]
    non_members = [d for d in data if d[0] not in sky]
    for a in members:
        for b in members:
            assert not dominates(a, b) or (a[1], a[2]) == (b[1], b[2])
    for b in non_members:
        assert any(dominates(a, b) for a in data), b


_docs_hh = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12),
    min_size=1,
    max_size=15,
)


@given(docs=_docs_hh, k=st.integers(min_value=2, max_value=6))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_heavy_hitters_exactness_law(spark, docs, k):
    """Two-pass MG == naive group-by threshold for random corpora and k,
    under a randomized partitioning."""
    from overseer_spark.operators.text import heavy_hitters

    pdf = [(" ".join(d),) for d in docs]
    df = spark.createDataFrame(pdf, "text string").repartition(3)
    toks = [t for d in docs for t in d]
    n = len(toks)
    from collections import Counter

    want = {(w, c) for w, c in Counter(toks).items() if c * k > n}
    got = {(r.token, r.freq) for r in heavy_hitters(df, k=k).collect()}
    assert got == want


_geo_pts = st.lists(
    st.tuples(
        # the FULL supported envelope, poles of the two hazards included:
        # |lat| -> 60 (a 500 km pair spans up to ~9 deg of longitude) and
        # the +/-180 antimeridian (wrap-around adjacency)
        st.floats(min_value=-60.0, max_value=60.0, allow_nan=False),
        st.floats(min_value=-180.0, max_value=179.999, allow_nan=False),
    ),
    min_size=2,
    max_size=15,
)


@given(pts=_geo_pts)
@settings(**_SETTINGS)
def test_geo_grid_blocking_recall_is_total(spark, pts):
    """Every true ≤500 km pair must appear among the grid-blocked
    candidates (blocking recall 1.0) — checked against a brute-force
    haversine, through the SAME operator the catalog entry uses (this
    test originally replicated the blocking inline and caught two real
    recall bugs in it: antimeridian wrap-around and the >5° longitude
    span near |lat|=60; it now drives operators/joins.py
    geo_block_candidates so entry and test cannot drift)."""
    import math

    from overseer_spark.operators.joins import geo_block_candidates

    data = [(i, float(lat), float(lon)) for i, (lat, lon) in enumerate(pts)]
    df = spark.createDataFrame(data, "id long, lat double, lon double")
    cands = {
        (r.x, r.y) for r in geo_block_candidates(df).select("x", "y").collect()
    }

    def hav(a, b):
        la1, lo1, la2, lo2 = map(math.radians, (a[1], a[2], b[1], b[2]))
        return (
            2
            * 6371.0
            * math.asin(
                math.sqrt(
                    math.sin((la2 - la1) / 2) ** 2
                    + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
                )
            )
        )

    true_pairs = {
        (a[0], b[0])
        for i, a in enumerate(data)
        for b in data[i + 1 :]
        if hav(a, b) <= 500
    }
    assert true_pairs <= cands, true_pairs - cands


def test_bootstrap_ci_covers_true_mean_and_scales(spark, duck):
    """q_bootstrap_ci: the 90% percentile CI must contain the exact mean,
    be reproducible run-to-run (deterministic hash weights), and have
    width in the right ballpark for n≈10k (≈ ±2·σ/√n)."""
    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_CORRECTNESS

    fn = CATALOG["q_bootstrap_ci"].fn
    r1 = fn(spark, SF_CORRECTNESS).collect()[0]
    r2 = fn(spark, SF_CORRECTNESS).collect()[0]
    assert r1 == r2, "bootstrap must be deterministic"
    true_mean, sd, n = duck.execute(
        "SELECT AVG(value), STDDEV_SAMP(value), COUNT(*) FROM events"
    ).fetchone()
    assert r1["ci_lo"] <= true_mean <= r1["ci_hi"], (r1, true_mean)
    width = r1["ci_hi"] - r1["ci_lo"]
    se = sd / n ** 0.5
    assert 1.5 * se < width < 6 * se, (width, se)
    assert r1["n_replicates"] == 100


def test_dp_noisy_counts_numpy_replay_and_utility(spark, duck):
    """q_dp_noisy_counts: the hash-seeded Laplace noise must replay
    exactly in numpy (same xxhash-derived uniforms via a Spark probe),
    and utility loss must be Laplace(1)-scale: mean |noise| ≈ 1, max
    |noise| within the distribution's plausible tail (≤ 15)."""
    from pyspark.sql import functions as F

    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_CORRECTNESS

    released = {
        (r["event_type"], str(r["d"])): r["released_n"]
        for r in CATALOG["q_dp_noisy_counts"].fn(spark, SF_CORRECTNESS).collect()
    }
    true = {
        (t, str(d)): n
        for t, d, n in duck.execute(
            "SELECT event_type, CAST(ts AS DATE), COUNT(*) FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    assert set(released) == set(true)
    noises = [released[k] - true[k] for k in released]
    import numpy as np

    a = np.abs(np.array(noises, dtype=np.float64))
    assert a.mean() < 3.0, a.mean()  # E|Laplace(1)| = 1
    assert a.max() <= 15.0, a.max()
    assert any(n != 0 for n in noises), "noise must actually perturb"
    # determinism: a second run releases identical values
    again = {
        (r["event_type"], str(r["d"])): r["released_n"]
        for r in CATALOG["q_dp_noisy_counts"].fn(spark, SF_CORRECTNESS).collect()
    }
    assert again == released


def test_session_entry_invariants(spark):
    """Mathematical invariants of the round-2 statistics entries, checked
    on real data (complementing their oracle hash-matches):
    KM survival is non-increasing and in (0,1]; PSI contributions are
    non-negative (signs of (p_cur−p_ref) and ln(p_cur/p_ref) agree);
    Benford observed proportions sum to 1; the shard plan partitions
    every document exactly once in doc_id order; AUC ∈ [0,1]."""
    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.sources.tables import load_table
    from tests.conftest import SF_CORRECTNESS

    sf = SF_CORRECTNESS

    km = CATALOG["q_survival_km"].fn(spark, sf).collect()
    s_prev = 1.0
    for r in km:
        assert 0.0 < r["s"] <= 1.0 and r["s"] <= s_prev + 1e-9, r
        s_prev = r["s"]

    psi = CATALOG["q_psi_drift"].fn(spark, sf).collect()
    assert all(r["psi_part"] >= 0.0 for r in psi)

    ben = CATALOG["q_benford_audit"].fn(spark, sf).collect()
    assert abs(sum(r["obs_p"] for r in ben) - 1.0) < 0.01
    assert {r["digit"] for r in ben} <= set(range(1, 10))

    shards = CATALOG["shard_plan_by_tokens"].fn(spark, sf).collect()
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in shards) == n_docs
    # shards tile the doc_id axis in order: each first_doc follows the
    # previous shard's last_doc
    shards.sort(key=lambda r: r["shard"])
    for a, b in zip(shards, shards[1:]):
        assert a["last_doc"] < b["first_doc"]

    auc = CATALOG["q_auc_rank"].fn(spark, sf).collect()[0]
    assert 0.0 <= auc["auc"] <= 1.0


_ac_alphabet = st.sampled_from("abc ")
_ac_pattern = st.text(_ac_alphabet, min_size=1, max_size=4)
_ac_patterns = st.lists(_ac_pattern, min_size=1, max_size=6, unique=True)
_ac_text = st.text(_ac_alphabet, min_size=0, max_size=60)


@given(patterns=_ac_patterns, text=_ac_text)
@settings(max_examples=200, deadline=None)
def test_aho_corasick_counts_equal_brute_force_all_matches(patterns, text):
    """Automaton law: for ANY pattern set (including self-overlapping and
    nested patterns over a tiny alphabet — the adversarial cases), the
    AC match count per pattern equals the brute-force all-occurrence
    count sum(text[i:].startswith(p)). No Spark involved: this pins the
    automaton the blocklist operator broadcasts."""
    from overseer_spark.operators.text import _build_aho_corasick

    goto, fail, out = _build_aho_corasick(tuple(patterns))
    counts = {}
    node = 0
    for ch in text:
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        for pid in out[node]:
            counts[pid] = counts.get(pid, 0) + 1
    for pid, p in enumerate(patterns):
        brute = sum(1 for i in range(len(text)) if text.startswith(p, i))
        assert counts.get(pid, 0) == brute, (p, text)


_chat_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),  # doc_id (dups dropped)
        st.lists(
            st.sampled_from(["tok", "a", "longerword", "x"]),
            min_size=1,
            max_size=45,
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(rows=_chat_docs)
@settings(**_SETTINGS)
def test_chat_audit_matches_python_replay(spark, rows):
    """operators/text.chat_audit == a pure-Python replay of the
    conversation synthesis + validation, across edge shapes the fixture
    corpus never hits: single-token docs (n = 1, the sequence(2, 1)
    descending-array guard), docs exactly at chunk boundaries, and the
    planted-defect residues interacting with tiny turn counts."""
    import math

    from overseer_spark.operators.text import chat_audit

    seen = set()
    data = []
    for doc_id, toks in rows:
        if doc_id in seen:
            continue
        seen.add(doc_id)
        data.append((doc_id, " ".join(toks), "s0"))
    df = spark.createDataFrame(data, "doc_id long, text string, source string")
    got = {r["source"]: (r["n_convs"], r["alt_violations"], r["empty_violations"],
                         r["bad_ending"], r["clean"])
           for r in chat_audit(df).collect()}

    n_convs = alt = empty = bad = clean = 0
    for doc_id, text, _ in data:
        w = text.split(" ")
        n = min(4 + doc_id % 2, max(1, math.ceil(len(w) / 8)))
        roles = [
            "user"
            if (doc_id % 7 == 0 and i == 2) or (i - 1) % 2 == 0
            else "assistant"
            for i in range(1, n + 1)
        ]
        contents = [
            "" if (doc_id % 11 == 0 and i == 1)
            else " ".join(w[(i - 1) * 8 : i * 8])
            for i in range(1, n + 1)
        ]
        v_alt = any(roles[i] == roles[i - 1] for i in range(1, n))
        v_empty = any(c == "" for c in contents)
        v_end = roles[-1] != "assistant"
        n_convs += 1
        alt += v_alt
        empty += v_empty
        bad += v_end
        clean += not (v_alt or v_empty or v_end)
    assert got == {"s0": (n_convs, alt, empty, bad, clean)}, (got, data)
