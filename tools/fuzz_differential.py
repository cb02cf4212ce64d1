"""Randomized differential testing: generate seeded random queries from a
small relational AST, execute them BOTH as a Spark DataFrame plan and as
DuckDB SQL over the same parquet, and compare results.

The hand-written catalog proves 300 curated operators; this harness
probes the space BETWEEN them — random projections, filters, grouped
aggregates, sorts, and limits — so an engine-semantics divergence
(null ordering, overflow behavior, type coercion, aggregate-over-empty)
surfaces even where no curated entry happens to exercise it. Seeded
generation makes every failure reproducible: re-run with the printed
seed.

Comparison is tolerance-aware for floating aggregates (SUM over doubles
is summation-order-dependent across engines) and exact for everything
else.

Usage:
    python tools/fuzz_differential.py --n 100 --seed 7 --sf /root/testdata/sf0.01
Library: `run_case(spark, con, sf_dir, seed)` returns (ok, detail); used
by tests/test_fuzz_differential.py.
"""

from __future__ import annotations

import argparse
import random
import re

TABLES = {
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "str": ["l_returnflag", "l_linestatus"],
    },
    "orders": {
        "num": ["o_totalprice"],
        "int": ["o_orderkey", "o_custkey"],
        "str": ["o_orderstatus", "o_orderpriority"],
    },
    "events": {
        "num": ["value"],
        "int": ["event_id", "user_id"],
        "str": ["event_type"],
    },
    "documents": {
        "num": [],
        "int": ["doc_id", "n_chars"],
        "str": ["lang", "source"],
    },
}


# per-table UNIQUE ordering key (window determinism requires total order).
# lineitem is EXCLUDED: the synthetic fixture has no unique key — even
# (l_orderkey, l_linenumber) repeats — so any window over it is
# tie-order-nondeterministic across engines (found by this fuzzer's own
# seed 9063; the catalog's lineitem entries are safe because their
# comparisons are order-insensitive aggregates).
UNIQUE_KEYS = {
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
}

JOINS = [
    # (left, right, left_key, right_key) — real FK edges in the fixtures
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
]

# customer columns for the join path (not in the single-table pool — the
# fixture has no c_mktsegment-free narrow set worth fuzzing alone here)
CUSTOMER_COLS = {"num": ["c_acctbal"], "int": ["c_custkey", "c_nationkey"],
                 "str": ["c_mktsegment"]}


def gen_case(rng: random.Random, family: str | None = None) -> dict:
    """One random query as a tiny AST dict (engine-neutral). ``family``
    forces a specific generator (dedicated per-family sweeps)."""
    if family == "gsets":
        return gen_gsets_case(rng)
    if family == "asofjoin":
        return gen_asof_case(rng) if rng.random() < 0.5 else gen_interval_case(rng)
    if family == "rangewin":
        return gen_rangewin_case(rng)
    if family == "strfunc":
        return gen_strfunc_case(rng)
    if family == "numfunc":
        return gen_numfunc_case(rng)
    if family == "decagg":
        return gen_decagg_case(rng)
    if family == "datescalar":
        return gen_datescalar_case(rng)
    if family == "arrayfunc":
        return gen_arrayfunc_case(rng)
    if family == "bitfunc":
        return gen_bitfunc_case(rng)
    roll = rng.random()
    if roll < 0.22:
        return gen_join_case(rng)
    if roll < 0.32:
        return gen_window_case(rng)
    if roll < 0.36:
        return gen_rangewin_case(rng)
    if roll < 0.49:
        return gen_expr_case(rng)
    if roll < 0.57:
        return gen_rollup_case(rng)
    if roll < 0.63:
        return gen_setop_case(rng)
    if roll < 0.7:
        return gen_subquery_case(rng)
    if roll < 0.76:
        return gen_having_case(rng)
    if roll < 0.81:
        return gen_datetime_case(rng)
    if roll < 0.86:
        return gen_gsets_case(rng)
    if roll < 0.9:
        return gen_asof_case(rng)
    if roll < 0.94:
        return gen_interval_case(rng)
    if roll < 0.95:
        return gen_strfunc_case(rng)
    if roll < 0.965:
        return gen_numfunc_case(rng)
    if roll < 0.975:
        return gen_decagg_case(rng)
    if roll < 0.982:
        return gen_datescalar_case(rng)
    if roll < 0.986:
        return gen_arrayfunc_case(rng)
    if roll < 0.99:
        return gen_bitfunc_case(rng)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    filters = []
    for _ in range(rng.randint(0, 2)):
        kind = rng.choice(["num", "int", "str"])
        pool = cols[kind]
        if not pool:
            continue
        c = rng.choice(pool)
        if kind == "str":
            op = rng.choice(["=", "<>", "LIKE"])
            # probe VALUES come from a fixed safe alphabet; LIKE uses a
            # one-letter prefix so both engines see identical semantics
            val = rng.choice("abcdefoprs")
            filters.append((c, op, f"{val}%" if op == "LIKE" else val))
        else:
            op = rng.choice(["<", "<=", ">", ">=", "="])
            val = rng.choice([0, 1, 5, 10, 100, 1000, 50000])
            filters.append((c, op, val))
    group = None
    aggs = []
    if rng.random() < 0.6 and cols["str"]:
        group = rng.choice(cols["str"])
        aggs.append(("count", "*"))
        npool = cols["num"] + cols["int"]
        for _ in range(rng.randint(0, 2)):
            fn = rng.choice(["sum", "min", "max", "avg"])
            aggs.append((fn, rng.choice(npool)))
    proj = None
    if group is None:
        pool = cols["int"] + cols["str"]
        k = rng.randint(1, min(3, len(pool)))
        proj = rng.sample(pool, k)
    limit = rng.choice([None, None, 50])
    return {
        "table": table,
        "filters": filters,
        "group": group,
        "aggs": aggs,
        "proj": proj,
        "limit": limit,
    }


def gen_having_case(rng: random.Random) -> dict:
    """Grouped aggregate with COUNT(DISTINCT) and a HAVING cut — probes
    distinct-aggregate planning (expand vs two-phase) and post-aggregate
    filtering, neither of which the base grouped family exercises."""
    table = rng.choice([t for t in TABLES if TABLES[t]["str"]])
    cols = TABLES[table]
    g = rng.choice(cols["str"])
    d = rng.choice(cols["int"] + cols["str"])
    thresh = rng.choice([0, 1, 2, 5, 50, 500])
    fn = rng.choice(["sum", "min", "max", "avg"])
    val = rng.choice(cols["num"] + cols["int"])
    return {"having": (table, g, d, thresh, fn, val)}


def gen_datetime_case(rng: random.Random) -> dict:
    """Event-time grouping over the ns-precision events.ts column —
    date_trunc units, calendar field extraction, and a time-range
    filter. This is the highest-portability-risk surface in the fixture
    (parquet TIMESTAMP(NANOS) -> Spark µs conversion in sources/
    tables.py must agree with DuckDB's own nanosecond truncation)."""
    unit = rng.choice(["day", "month", "hour", "week"])
    field = rng.choice(["year", "month", "hour", "minute"])
    lo = rng.choice([None, "2024-02-01", "2024-03-15"])
    agg = rng.choice(["count", "sum", "avg"])
    return {"datetime": (unit, field, lo, agg)}


def datetime_to_sql(case: dict) -> str:
    unit, field, lo, agg = case["datetime"]
    where = f"WHERE ts >= TIMESTAMP '{lo} 00:00:00'" if lo else ""
    # raw aggregate, not ROUND(...): tolerance compare handles FP sum-order
    # differences; rounding would turn a 1e-13 divergence at a .005
    # boundary into a false positive
    a = "CAST(COUNT(*) AS BIGINT)" if agg == "count" else f"{agg.upper()}(value)"
    return (
        f"SELECT CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS p, "
        f"CAST({field}(ts) AS BIGINT) AS f, {a} AS a "
        f"FROM events {where} GROUP BY p, f ORDER BY p, f"
    )


def build_datetime_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    unit, field, lo, agg = case["datetime"]
    df = load_table(spark, sf_dir, "events")
    if lo:
        df = df.where(F.col("ts") >= F.lit(f"{lo} 00:00:00").cast("timestamp"))
    field_fn = {"year": F.year, "month": F.month, "hour": F.hour,
                "minute": F.minute}[field]
    a = (
        F.count(F.lit(1)).cast("long")
        if agg == "count"
        else getattr(F, agg)("value")
    )
    return (
        df.groupBy(
            F.date_trunc(unit, "ts").alias("p"), field_fn("ts").cast("long").alias("f")
        )
        .agg(a.alias("a"))
        .orderBy("p", "f")
    )


def having_to_sql(case: dict) -> str:
    t, g, d, th, fn, v = case["having"]
    return (
        f"SELECT {g}, CAST(COUNT(DISTINCT {d}) AS BIGINT) AS nd, "
        f"CAST({fn.upper()}({v}) AS DOUBLE) AS a FROM {t} "
        f"GROUP BY {g} HAVING COUNT(DISTINCT {d}) > {th} ORDER BY {g}"
    )


def build_having_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    t, g, d, th, fn, v = case["having"]
    nd = F.count_distinct(d).cast("long")
    return (
        load_table(spark, sf_dir, t)
        .groupBy(g)
        .agg(nd.alias("nd"), getattr(F, fn)(v).cast("double").alias("a"))
        .where(F.col("nd") > th)
        .orderBy(g)
    )


EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]


def gen_gsets_case(rng: random.Random) -> dict:
    """GROUPING-SETS NULL semantics: one group key is artificially
    nullified (CASE prefix match → NULL) so NATURAL NULLs collide with
    super-aggregate NULLs, then disambiguated via GROUPING() flags —
    rollup vs cube, COUNT(*) vs COUNT(nullable), and an exact integer
    SUM. The classic dialect seam (Spark grouping() vs DuckDB
    GROUPING(); indicator-bit conventions) the curated rollup entry
    does not probe with natural NULLs present."""
    pool = [(t, TABLES[t]["str"]) for t in TABLES if len(TABLES[t]["str"]) >= 2]
    table, strs = rng.choice(pool)
    a, b = rng.sample(strs, 2)
    ic = rng.choice(TABLES[table]["int"])
    letter = rng.choice("abcdefoprs")
    mode = rng.choice(["rollup", "cube"])
    return {"gsets": (table, a, b, ic, letter, mode)}


def gsets_to_sql(case: dict) -> str:
    t, a, b, ic, letter, mode = case["gsets"]
    ka = f"CASE WHEN {a} LIKE '{letter}%' THEN NULL ELSE {a} END"
    fn = "ROLLUP" if mode == "rollup" else "CUBE"
    return (
        f"SELECT {ka} AS ka, {b} AS kb, "
        f"CAST(GROUPING({ka}) AS BIGINT) AS ga, "
        f"CAST(GROUPING({b}) AS BIGINT) AS gb, "
        f"CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(COUNT({ka}) AS BIGINT) AS nn, "
        f"CAST(SUM({ic}) AS BIGINT) AS s "
        f"FROM {t} GROUP BY {fn} ({ka}, {b})"
    )


def build_gsets_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    t, a, b, ic, letter, mode = case["gsets"]
    df = load_table(spark, sf_dir, t).withColumn(
        "ka",
        F.when(F.col(a).startswith(letter), F.lit(None)).otherwise(F.col(a)),
    )
    g = df.rollup("ka", b) if mode == "rollup" else df.cube("ka", b)
    return g.agg(
        F.grouping("ka").cast("long").alias("ga"),
        F.grouping(b).cast("long").alias("gb"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("ka").cast("long").alias("nn"),
        F.sum(ic).cast("long").alias("s"),
    ).select("ka", F.col(b).alias("kb"), "ga", "gb", "n", "nn", "s")


def gen_asof_case(rng: random.Random) -> dict:
    """Backward as-of join: our window-based asof_join operator
    (operators/joins.py) vs DuckDB's NATIVE ASOF LEFT JOIN — per
    user_id, each left event picks the newest right event at-or-before
    (or strictly-before) its timestamp. The right side is deduped to
    one row per (user_id, ts) with a MAX(event_id) payload so tie
    resolution is deterministic on both engines."""
    lt, rt = rng.sample(EVENT_TYPES, 2)
    return {"asof": (lt, rt, rng.random() < 0.5)}


def asof_to_sql(case: dict) -> str:
    lt, rt, exact = case["asof"]
    cmp_ = ">=" if exact else ">"
    return (
        f"WITH l AS (SELECT event_id, user_id, ts FROM events "
        f"           WHERE event_type = '{lt}'), "
        f"r AS (SELECT user_id, ts, MAX(event_id) AS rid FROM events "
        f"      WHERE event_type = '{rt}' GROUP BY user_id, ts) "
        f"SELECT l.event_id, r.rid "
        f"FROM l ASOF LEFT JOIN r "
        f"ON l.user_id = r.user_id AND l.ts {cmp_} r.ts"
    )


def build_asof_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.operators.joins import asof_join
    from overseer_spark.sources.tables import load_table

    lt, rt, exact = case["asof"]
    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == lt).select("event_id", "user_id", "ts")
    right = (
        ev.where(F.col("event_type") == rt)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("rid"))
    )
    return asof_join(
        left, right, on="ts", by=["user_id"], allow_exact_matches=exact
    ).select("event_id", F.col("rid_right").alias("rid"))


def gen_interval_case(rng: random.Random) -> dict:
    """Interval (tolerance-band) join: our bucketed interval_join
    operator vs a plain DuckDB theta join on |Δts| ≤ tolerance within
    user_id — validates the bucket-replicate-residual rewrite emits
    exactly the theta-join pair set, including bucket-boundary pairs."""
    lt, rt = rng.sample(EVENT_TYPES, 2)
    tol_s = rng.choice([2, 5, 15, 60])
    return {"interval": (lt, rt, tol_s)}


def interval_to_sql(case: dict) -> str:
    lt, rt, tol_s = case["interval"]
    return (
        f"WITH l AS (SELECT event_id, user_id, ts FROM events "
        f"           WHERE event_type = '{lt}'), "
        f"r AS (SELECT event_id AS rid, user_id, ts AS rts FROM events "
        f"      WHERE event_type = '{rt}') "
        f"SELECT l.event_id, r.rid FROM l JOIN r "
        f"ON l.user_id = r.user_id "
        f"AND ABS(epoch_us(l.ts) - epoch_us(r.rts)) <= {tol_s * 1_000_000}"
    )


def build_interval_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.operators.joins import interval_join
    from overseer_spark.sources.tables import load_table

    lt, rt, tol_s = case["interval"]
    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == lt).select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == rt).select(
        "user_id", "ts", F.col("event_id").alias("rid")
    )
    return interval_join(
        left, right, on="ts", tolerance_us=tol_s * 1_000_000, by=["user_id"]
    ).select("event_id", F.col("rid_right").alias("rid"))


def gen_join_case(rng: random.Random) -> dict:
    """Random FK equi-join (INNER or LEFT): filter each side, group by a
    string column, aggregate with COUNT(*) vs COUNT(col) — under LEFT
    joins the unmatched rows carry NULLs, so the two counts diverge and
    both engines must agree on exactly how."""
    left, right, lk, rk = rng.choice(JOINS)
    rcols = TABLES.get(right, CUSTOMER_COLS)
    lcols = TABLES[left]
    filters = []
    if rng.random() < 0.7:
        c = rng.choice(lcols["num"] + lcols["int"])
        filters.append(("l", c, rng.choice([">", "<"]), rng.choice([1, 10, 1000, 50000])))
    if rng.random() < 0.5 and rcols["str"]:
        filters.append(("r", rng.choice(rcols["str"]), "LIKE",
                        rng.choice("ABCFOP") + "%"))
    gside, gcol = ("l", rng.choice(lcols["str"])) if (rng.random() < 0.5 and lcols["str"]) else (
        ("r", rng.choice(rcols["str"])) if rcols["str"] else ("l", lcols["str"][0]))
    aggs = [("count", "*")]
    how = "left" if rng.random() < 0.4 else "inner"
    if how == "left":
        # count a RIGHT-side column: NULL on unmatched rows, so
        # COUNT(col) < COUNT(*) exactly where the join missed
        rn = rcols["int"] + rcols["num"]
        aggs.append(("count_col", rng.choice(rn)))
        # left-side group key only (right side may be NULL)
        gside, gcol = ("l", lcols["str"][0])
    npool = lcols["num"] + lcols["int"]
    if rng.random() < 0.7:
        aggs.append((rng.choice(["sum", "min", "max"]), rng.choice(npool)))
    return {"join": (left, right, lk, rk), "filters": filters,
            "group": (gside, gcol), "aggs": aggs, "how": how}


_STRFUNC_OPS = ["substr", "replace", "instr", "trimpad", "reverse",
                "lower", "lpad"]


def gen_strfunc_case(rng: random.Random) -> dict:
    """Row-level string-function projection over a unique-keyed table:
    SUBSTR with in- and out-of-range bounds, REPLACE (including
    empty-string replacement), STRPOS/INSTR (0 on miss), TRIM over
    concat-padded input, REVERSE, LOWER, LPAD, and optional LIKE
    filters with %/_ wildcards — the scalar string dialect seam at row
    granularity (the grouped expr family only sees 4 ops through an
    aggregate)."""
    table = rng.choice(list(UNIQUE_KEYS))
    cols = TABLES[table]
    sc = rng.choice(cols["str"])
    ops = rng.sample(_STRFUNC_OPS, k=rng.randint(1, 3))
    params = {
        "substr": (rng.choice([1, 2, 3, 5, 100]), rng.choice([1, 2, 3, 50])),
        "replace": (rng.choice("aceiklnorst-_01"),
                    rng.choice(["X", "", "zz"])),
        "instr": rng.choice("aceiklnorst-_019"),
        "lpad": (rng.choice([4, 10, 16]), rng.choice(["*", "ab"])),
    }
    like = None
    if rng.random() < 0.5:
        ch = rng.choice("aceiklnorst")
        like = rng.choice([f"{ch}%", f"%{ch}", f"%{ch}%", f"_{ch}%"])
    return {"strfunc": (table, sc, ops, params, like)}


def _strfunc_sql_expr(op: str, sc: str, params: dict) -> str:
    if op == "substr":
        a, b = params["substr"]
        return f"SUBSTR({sc}, {a}, {b})"
    if op == "replace":
        c, r = params["replace"]
        return f"REPLACE({sc}, '{c}', '{r}')"
    if op == "instr":
        return f"CAST(STRPOS({sc}, '{params['instr']}') AS BIGINT)"
    if op == "trimpad":
        return f"TRIM('  ' || {sc} || ' ')"
    if op == "reverse":
        return f"REVERSE({sc})"
    if op == "lower":
        return f"LOWER({sc})"
    a, p = params["lpad"]
    return f"LPAD({sc}, {a}, '{p}')"


def strfunc_to_sql(case: dict) -> str:
    table, sc, ops, params, like = case["strfunc"]
    key = UNIQUE_KEYS[table]
    ks = ", ".join(key)
    sel = ", ".join(
        f"{_strfunc_sql_expr(op, sc, params)} AS c{i}"
        for i, op in enumerate(ops)
    )
    where = f" WHERE {sc} LIKE '{like}'" if like else ""
    return (
        f"SELECT {ks}, {sel} FROM {table}{where} ORDER BY {ks}"
    )


def build_strfunc_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    table, sc, ops, params, like = case["strfunc"]
    key = UNIQUE_KEYS[table]

    def expr(op):
        if op == "substr":
            a, b = params["substr"]
            return F.substring(sc, a, b)
        if op == "replace":
            c, r = params["replace"]
            return F.regexp_replace(F.col(sc), re.escape(c), r.replace("\\", "\\\\"))
        if op == "instr":
            return F.instr(F.col(sc), params["instr"]).cast("long")
        if op == "trimpad":
            return F.trim(F.concat(F.lit("  "), F.col(sc), F.lit(" ")))
        if op == "reverse":
            return F.reverse(F.col(sc))
        if op == "lower":
            return F.lower(F.col(sc))
        a, p = params["lpad"]
        return F.lpad(F.col(sc), a, p)

    df = load_table(spark, sf_dir, table)
    if like:
        df = df.where(F.col(sc).like(like))
    return df.select(
        *key, *[expr(op).alias(f"c{i}") for i, op in enumerate(ops)]
    ).orderBy(*key)


def gen_expr_case(rng: random.Random) -> dict:
    """Random scalar-expression aggregation: string functions (LENGTH/
    UPPER/SUBSTR) and arithmetic (+ * round) composed over a grouped
    aggregate — probes expression semantics (unicode length, substr
    bounds, numeric promotion) where engines historically differ."""
    table = rng.choice([t for t in TABLES if TABLES[t]["str"]])
    cols = TABLES[table]
    sc = rng.choice(cols["str"])
    nc = rng.choice(cols["num"] + cols["int"])
    sfn = rng.choice(["length", "upper", "substr1_2", "concat_x"])
    nexpr = rng.choice(["plus1", "times2", "half_round"])
    return {"expr": (table, sc, nc, sfn, nexpr)}


def expr_to_sql(case: dict) -> str:
    table, sc, nc, sfn, nexpr = case["expr"]
    skey = {
        "length": f"LENGTH({sc})",
        "upper": f"UPPER({sc})",
        "substr1_2": f"SUBSTR({sc}, 1, 2)",
        "concat_x": f"{sc} || '_x'",
    }[sfn]
    nval = {
        "plus1": f"SUM({nc} + 1)",
        "times2": f"SUM({nc} * 2)",
        "half_round": f"ROUND(SUM({nc} / 2.0), 2)",
    }[nexpr]
    return (
        f"SELECT {skey} AS k, CAST(COUNT(*) AS BIGINT) AS n, "
        f"ROUND(CAST({nval} AS DOUBLE), 2) AS v "
        f"FROM {table} GROUP BY k ORDER BY k"
    )


def build_expr_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    table, sc, nc, sfn, nexpr = case["expr"]
    skey = {
        "length": F.length(sc),
        "upper": F.upper(sc),
        "substr1_2": F.substring(sc, 1, 2),
        "concat_x": F.concat(F.col(sc), F.lit("_x")),
    }[sfn]
    nval = {
        "plus1": F.sum(F.col(nc) + 1),
        "times2": F.sum(F.col(nc) * 2),
        "half_round": F.round(F.sum(F.col(nc) / 2.0), 2),
    }[nexpr]
    return (
        load_table(spark, sf_dir, table)
        .groupBy(skey.alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(nval.cast("double"), 2).alias("v"),
        )
        .orderBy("k")
    )


def gen_subquery_case(rng: random.Random) -> dict:
    """IN / NOT IN membership subqueries along FK edges — Catalyst must
    decorrelate these to hash semi/anti joins, and NOT IN is the classic
    null-semantics divergence trap (safe here: fixture FKs are non-null,
    which is exactly the case engines must agree on)."""
    left, right, lk, rk = rng.choice(JOINS)
    rcols = TABLES.get(right, CUSTOMER_COLS)
    neg = rng.random() < 0.5
    rfilter = ""
    if rcols["str"] and rng.random() < 0.8:
        rfilter = f" WHERE {rng.choice(rcols['str'])} LIKE '{rng.choice('ABCFOP')}%'"
    g = rng.choice(TABLES[left]["str"])
    return {"subq": (left, right, lk, rk, neg, rfilter, g)}


def subquery_to_sql(case: dict) -> str:
    left, right, lk, rk, neg, rfilter, g = case["subq"]
    op = "NOT IN" if neg else "IN"
    return (
        f"SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n FROM {left} "
        f"WHERE {lk} {op} (SELECT {rk} FROM {right}{rfilter}) "
        f"GROUP BY {g} ORDER BY {g}"
    )


def build_subquery_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    left, right, lk, rk, neg, rfilter, g = case["subq"]
    l = load_table(spark, sf_dir, left)
    r = load_table(spark, sf_dir, right)
    if rfilter:
        colname = rfilter.split("WHERE ")[1].split(" LIKE")[0]
        pat = rfilter.split("LIKE '")[1].rstrip("'")
        r = r.filter(F.col(colname).like(pat))
    keys = r.select(F.col(rk).alias(lk))
    joined = l.join(keys, lk, "left_anti" if neg else "left_semi")
    return (
        joined.groupBy(g)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(g)
    )


def gen_rollup_case(rng: random.Random) -> dict:
    """ROLLUP over two string columns with COALESCE'd null indicators —
    grouping-set semantics (subtotal rows, null-vs-'ALL' collisions) are
    a classic cross-engine divergence area."""
    pool = [(t, TABLES[t]["str"]) for t in TABLES if len(TABLES[t]["str"]) >= 2]
    table, strs = rng.choice(pool)
    a, b = rng.sample(strs, 2)
    nc = rng.choice(TABLES[table]["num"] + TABLES[table]["int"])
    return {"rollup": (table, a, b, nc)}


def rollup_to_sql(case: dict) -> str:
    table, a, b, nc = case["rollup"]
    return (
        f"SELECT COALESCE({a}, '__all__') AS ka, "
        f"COALESCE({b}, '__all__') AS kb, "
        f"CAST(COUNT(*) AS BIGINT) AS n, "
        f"ROUND(CAST(SUM({nc}) AS DOUBLE), 2) AS s "
        f"FROM {table} GROUP BY ROLLUP ({a}, {b}) ORDER BY ka, kb"
    )


def build_rollup_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    table, a, b, nc = case["rollup"]
    return (
        load_table(spark, sf_dir, table)
        .rollup(a, b)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum(nc).cast("double"), 2).alias("s"),
        )
        .select(
            F.coalesce(F.col(a), F.lit("__all__")).alias("ka"),
            F.coalesce(F.col(b), F.lit("__all__")).alias("kb"),
            "n",
            "s",
        )
        .orderBy("ka", "kb")
    )


def gen_setop_case(rng: random.Random) -> dict:
    """UNION / INTERSECT / EXCEPT of two filtered projections of the same
    string column — distinct semantics and null handling of set ops."""
    table = rng.choice([t for t in TABLES if TABLES[t]["str"] and TABLES[t]["int"]])
    sc = rng.choice(TABLES[table]["str"])
    ic = rng.choice(TABLES[table]["int"])
    op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
    lo, hi = sorted(rng.sample([0, 10, 100, 1000, 50000], 2))
    return {"setop": (table, sc, ic, op, lo, hi)}


def setop_to_sql(case: dict) -> str:
    table, sc, ic, op, lo, hi = case["setop"]
    return (
        f"SELECT {sc} FROM {table} WHERE {ic} > {lo} "
        f"{op} "
        f"SELECT {sc} FROM {table} WHERE {ic} < {hi} "
        f"ORDER BY {sc}"
    )


def build_setop_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    table, sc, ic, op, lo, hi = case["setop"]
    df = load_table(spark, sf_dir, table)
    l = df.where(F.col(ic) > lo).select(sc)
    r = df.where(F.col(ic) < hi).select(sc)
    if op == "UNION":
        out = l.union(r).distinct()
    elif op == "INTERSECT":
        out = l.intersect(r)
    else:
        out = l.subtract(r)  # EXCEPT (distinct semantics)
    return out.orderBy(sc)


def gen_rangewin_case(rng: random.Random) -> dict:
    """RANGE-frame window: value-based frames over a (possibly tied)
    integer ordering.  RANGE frames include ALL peers of the boundary
    rows, so SUM/COUNT/MIN/MAX over them are deterministic even without
    a unique ordering key — which is exactly why this family may fuzz
    lineitem, the table the ROWS-frame family must exclude (tie-order
    nondeterminism, determinism rule 7).  Probes the frame-boundary
    dialect seam: inclusive numeric offsets, peers at the frame edge,
    empty-frame semantics with FOLLOWING-only bounds."""
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    if not cols["str"] or not cols["int"]:
        table = "lineitem"
        cols = TABLES[table]
    part = rng.choice(cols["str"])
    ordc = rng.choice(cols["int"])
    fn = rng.choice(["sum", "count", "min", "max"])
    val = rng.choice(cols["num"] + cols["int"])
    d1 = rng.choice([0, 1, 5, 100, 1000])
    d2 = rng.choice([None, 0, 1, 100])  # None = CURRENT ROW upper bound
    return {"rangewin": (table, part, ordc, fn, val, d1, d2)}


def rangewin_to_sql(case: dict) -> str:
    table, part, ordc, fn, val, d1, d2 = case["rangewin"]
    upper = "CURRENT ROW" if d2 is None else f"{d2} FOLLOWING"
    expr = "COUNT(*)" if fn == "count" else f"{fn.upper()}({val})"
    return (
        f"SELECT {part}, {ordc}, ROUND(CAST(v AS DOUBLE), 4) AS v FROM "
        f"(SELECT {part}, {ordc}, {expr} OVER (PARTITION BY {part} "
        f"ORDER BY {ordc} RANGE BETWEEN {d1} PRECEDING AND {upper}) AS v "
        f"FROM {table}) t ORDER BY {part}, {ordc}"
    )


def build_rangewin_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    table, part, ordc, fn, val, d1, d2 = case["rangewin"]
    upper = Window.currentRow if d2 is None else d2
    w = Window.partitionBy(part).orderBy(ordc).rangeBetween(-d1, upper)
    v = F.count(F.lit(1)).over(w) if fn == "count" else getattr(F, fn)(val).over(w)
    return (
        load_table(spark, sf_dir, table)
        .select(part, ordc, v.alias("v"))
        .select(part, ordc, F.round(F.col("v").cast("double"), 4).alias("v"))
        .orderBy(part, ordc)
    )


# numfunc op pool; per-table availability is resolved in the generator.
_NUMFUNC_OPS = [
    "pmod", "bitand", "bitor", "bitxor", "shiftl", "trycast_str",
    "trydiv", "lnguard", "floordiv", "json_k", "json_miss",
    "greatest", "abs_sign",
]


def gen_numfunc_case(rng: random.Random) -> dict:
    """Row-level numeric / JSON scalar seams over a unique-keyed table:
    pmod-of-negative (Spark PMOD vs the ((a%m)+m)%m identity), bitwise
    AND/OR/XOR and left shift, TRY_CAST on digit- and letter-prefixed
    strings (NULL-on-miss), TRY_DIVIDE with a NULLIF'd divisor, LN
    behind a positivity guard, FLOOR division, JSON path extraction
    (present and missing key) and GREATEST/ABS/SIGN around a shifted
    zero — the integer/NULL edge semantics the grouped expr family
    never reaches. Filter is a modulo-residue cut so the result stays
    a few thousand rows and the filter itself probes % pushdown."""
    table = rng.choice(["events", "orders"])
    if table == "events":
        ic, dc, sc = "user_id", "value", "event_type"
        pool = list(_NUMFUNC_OPS)
    else:
        ic, dc, sc = "o_custkey", "o_totalprice", "o_orderpriority"
        pool = [o for o in _NUMFUNC_OPS if not o.startswith("json_")]
    ops = rng.sample(pool, k=rng.randint(2, 4))
    params = {
        "m": rng.choice([3, 5, 7, 11, 64, 255]),
        "shift_k": rng.choice([1, 2, 4, 7]),
        "sub_k": rng.choice([0, 37, 1000, 50000]),
        "div_k": rng.choice([2, 3, 9]),
        "substr_a": rng.choice([1, 2]),
        "flo_d": rng.choice([7.0, 13.0, 2.5]),
    }
    pmodr = (rng.choice([2, 3, 5]), rng.randint(0, 1))
    return {"numfunc": (table, ic, dc, sc, ops, params, pmodr)}


def _numfunc_sql_expr(op: str, ic: str, dc: str, sc: str, p: dict) -> str:
    m, k = p["m"], p["sub_k"]
    if op == "pmod":
        return f"((({ic} - {k}) % {m}) + {m}) % {m}"
    if op == "bitand":
        return f"{ic} & {m}"
    if op == "bitor":
        return f"{ic} | {m}"
    if op == "bitxor":
        return f"xor({ic}, {m})"
    if op == "shiftl":
        return f"{ic} << {p['shift_k']}"
    if op == "trycast_str":
        return f"TRY_CAST(SUBSTR({sc}, {p['substr_a']}, 1) AS INTEGER)"
    if op == "trydiv":
        return f"CAST({dc} AS DOUBLE) / NULLIF({ic} % {p['div_k']}, 0)"
    if op == "lnguard":
        return f"LN(CASE WHEN {dc} > 0.5 THEN {dc} END)"
    if op == "floordiv":
        return f"CAST(FLOOR({ic} / {p['flo_d']}) AS BIGINT)"
    if op == "json_k":
        return "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    if op == "json_miss":
        return "json_extract_string(props, '$.zz')"
    if op == "greatest":
        return f"GREATEST({ic}, {m})"
    return f"ABS({ic} - {k}) + SIGN({ic} - {k})"  # abs_sign


def numfunc_to_sql(case: dict) -> str:
    table, ic, dc, sc, ops, params, (pm, pr) = case["numfunc"]
    key = UNIQUE_KEYS[table][0]
    sel = ", ".join(
        f"{_numfunc_sql_expr(op, ic, dc, sc, params)} AS c{i}"
        for i, op in enumerate(ops)
    )
    return (
        f"SELECT {key}, {sel} FROM {table} "
        f"WHERE {key} % {pm} = {pr} ORDER BY {key}"
    )


def build_numfunc_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    table, ic, dc, sc, ops, params, (pm, pr) = case["numfunc"]
    key = UNIQUE_KEYS[table][0]
    m, k = params["m"], params["sub_k"]

    def expr(op):
        if op == "pmod":
            return F.pmod(F.col(ic) - k, F.lit(m))
        if op == "bitand":
            return F.col(ic).bitwiseAND(F.lit(m))
        if op == "bitor":
            return F.col(ic).bitwiseOR(F.lit(m))
        if op == "bitxor":
            return F.col(ic).bitwiseXOR(F.lit(m))
        if op == "shiftl":
            return F.shiftleft(F.col(ic), params["shift_k"])
        if op == "trycast_str":
            return F.substring(sc, params["substr_a"], 1).try_cast("int")
        if op == "trydiv":
            d = F.col(ic) % params["div_k"]
            return F.try_divide(F.col(dc).cast("double"), F.when(d != 0, d))
        if op == "lnguard":
            return F.ln(F.when(F.col(dc) > 0.5, F.col(dc)))
        if op == "floordiv":
            return F.floor(F.col(ic) / params["flo_d"]).cast("long")
        if op == "json_k":
            return F.get_json_object("props", "$.k").cast("long")
        if op == "json_miss":
            return F.get_json_object("props", "$.zz")
        if op == "greatest":
            return F.greatest(F.col(ic), F.lit(m))
        return F.abs(F.col(ic) - k) + F.signum(F.col(ic) - k).cast("long")

    return (
        load_table(spark, sf_dir, table)
        .where(F.col(key) % pm == pr)
        .select(key, *[expr(op).alias(f"c{i}") for i, op in enumerate(ops)])
        .orderBy(key)
    )


_DATESCALAR_OPS = [
    "trunc_day", "trunc_month", "trunc_year", "trunc_hour",
    "yr", "mo", "dy", "hr", "dow0", "doy",
    "plus_days", "diff_from_anchor", "last_day", "epoch_s",
]


def gen_datescalar_case(rng: random.Random) -> dict:
    """Row-level datetime scalar seams over events.ts: date_trunc at four
    granularities, EXTRACT fields including the day-of-week convention
    seam (Spark DAYOFWEEK is 1=Sunday, DuckDB dow is 0=Sunday — both
    sides encode the 0=Sunday form), day arithmetic, signed day diffs
    from an anchor, LAST_DAY, and epoch seconds. The grouped datetime
    family only sees timestamps through date_trunc buckets; this probes
    the scalar surface at row granularity."""
    ops = rng.sample(_DATESCALAR_OPS, k=rng.randint(2, 4))
    params = {
        "k_days": rng.choice([1, 7, 30, 365]),
        "anchor": rng.choice(["2024-01-10", "2024-02-01", "2023-12-31"]),
    }
    resid = (rng.choice([2, 3, 5]), rng.randint(0, 1))
    return {"datescalar": (ops, params, resid)}


def _datescalar_sql_expr(op: str, p: dict) -> str:
    if op.startswith("trunc_"):
        return f"CAST(date_trunc('{op[6:]}', ts) AS TIMESTAMP)"
    field = {
        "yr": "year", "mo": "month", "dy": "day", "hr": "hour",
        "doy": "doy",
    }.get(op)
    if field:
        return f"CAST(EXTRACT({field} FROM ts) AS BIGINT)"
    if op == "dow0":
        return "CAST(EXTRACT(dow FROM ts) AS BIGINT)"  # 0 = Sunday
    if op == "plus_days":
        return f"ts + INTERVAL {p['k_days']} DAY"
    if op == "diff_from_anchor":
        return (
            f"CAST(date_diff('day', DATE '{p['anchor']}', CAST(ts AS DATE))"
            " AS BIGINT)"
        )
    if op == "last_day":
        return "last_day(CAST(ts AS DATE))"
    return "CAST(FLOOR(epoch(ts)) AS BIGINT)"  # epoch_s


def datescalar_to_sql(case: dict) -> str:
    ops, params, (m, r) = case["datescalar"]
    sel = ", ".join(
        f"{_datescalar_sql_expr(op, params)} AS c{i}" for i, op in enumerate(ops)
    )
    return (
        f"SELECT event_id, {sel} FROM events "
        f"WHERE event_id % {m} = {r} ORDER BY event_id"
    )


def build_datescalar_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    ops, params, (m, r) = case["datescalar"]

    def expr(op):
        if op.startswith("trunc_"):
            return F.date_trunc(op[6:], F.col("ts"))
        if op == "yr":
            return F.year("ts").cast("long")
        if op == "mo":
            return F.month("ts").cast("long")
        if op == "dy":
            return F.dayofmonth("ts").cast("long")
        if op == "hr":
            return F.hour("ts").cast("long")
        if op == "dow0":
            return (F.dayofweek("ts") - 1).cast("long")  # 0 = Sunday
        if op == "doy":
            return F.dayofyear("ts").cast("long")
        if op == "plus_days":
            return F.col("ts") + F.expr(f"INTERVAL {params['k_days']} DAY")
        if op == "diff_from_anchor":
            return F.datediff(
                F.col("ts").cast("date"), F.lit(params["anchor"]).cast("date")
            ).cast("long")
        if op == "last_day":
            return F.last_day(F.col("ts").cast("date"))
        return F.unix_timestamp("ts").cast("long")  # epoch_s

    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") % m == r)
        .select(
            "event_id", *[expr(op).alias(f"c{i}") for i, op in enumerate(ops)]
        )
        .orderBy("event_id")
    )


def gen_decagg_case(rng: random.Random) -> dict:
    """Exact DECIMAL grouped aggregation: SUM / MIN / MAX over
    CAST(num AS DECIMAL(18,2)) with a random residue filter — compared
    as EXACT STRINGS, no float tolerance. Floating SUM divergence hides
    behind the tolerance compare everywhere else; money math must be
    bit-exact across engines or the engine is wrong."""
    table = rng.choice(["lineitem", "orders"])
    cols = TABLES[table]
    g = rng.choice(cols["str"])
    nc = rng.choice(cols["num"])
    fns = rng.sample(["sum", "min", "max"], k=rng.randint(1, 3))
    ic = rng.choice(cols["int"])
    resid = (rng.choice([2, 3, 7]), rng.randint(0, 1))
    return {"decagg": (table, g, nc, fns, ic, resid)}


def decagg_to_sql(case: dict) -> str:
    table, g, nc, fns, ic, (m, r) = case["decagg"]
    sel = [g, "CAST(COUNT(*) AS BIGINT) AS n"]
    for i, fn in enumerate(fns):
        # SUM widens differently per engine (Spark 28,2 / DuckDB 38,2);
        # normalize to DECIMAL(28,2) so the textual form is identical
        sel.append(
            f"CAST({fn.upper()}(CAST({nc} AS DECIMAL(18,2))) "
            f"AS DECIMAL(28,2)) AS a{i}"
        )
    return (
        f"SELECT {', '.join(sel)} FROM {table} WHERE {ic} % {m} = {r} "
        f"GROUP BY {g} ORDER BY {g}"
    )


def build_decagg_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    table, g, nc, fns, ic, (m, r) = case["decagg"]
    dec = F.col(nc).cast("decimal(18,2)")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, fn in enumerate(fns):
        aggs.append(
            getattr(F, fn)(dec).cast("decimal(28,2)").alias(f"a{i}")
        )
    return (
        load_table(spark, sf_dir, table)
        .where(F.col(ic) % m == r)
        .groupBy(g)
        .agg(*aggs)
        .orderBy(g)
    )


_ARRAYFUNC_OPS = [
    "size", "slice_join", "elem", "contains", "position", "filt_count",
    "agg_len", "distinct_sorted", "seq_sum", "reverse_join", "union_sorted",
    "zip_len_sum",
]

# probe tokens: common fixture vocabulary + one guaranteed-absent
_ARRAY_TOKENS = ["the", "a", "table", "data", "value", "xyzzy"]


def gen_arrayfunc_case(rng: random.Random) -> dict:
    """Array/list scalar seams over documents tokens — the 18th family.
    Motivated by a real divergence the curated catalog only caught by
    luck in round 7: Spark ``sequence(2, 1)`` yields the DESCENDING
    [2, 1] while DuckDB ``range(2, 2)`` is empty, so any dynamic bound
    that can invert silently flips semantics. The family probes the
    surface where engines differ by convention, with each case pinning
    the normalized form: out-of-bounds access (try_element_at NULL ≡
    bracket NULL), absence encoding (array_position 0 → NULLIF ≡
    list_position NULL), order-unstable ops (distinct/union compared
    through an explicit sort), HOF folds, slices, zips on equal-length
    inputs (both engines NULL-pad unequal zips), and sequence in its
    safe ascending regime."""
    ops = rng.sample(_ARRAYFUNC_OPS, k=rng.randint(2, 4))
    a = rng.randint(1, 5)
    params = {
        "a": a,
        "l": rng.randint(1, 4),
        "k": rng.randint(1, 6),
        "tok": rng.choice(_ARRAY_TOKENS),
        "c": rng.randint(2, 6),
        "lo": rng.randint(1, 3),
        "hi": rng.randint(3, 8),  # lo <= hi always: sequence's safe regime
    }
    resid = (rng.choice([2, 3, 5]), rng.randint(0, 1))
    return {"arrayfunc": (ops, params, resid)}


def _arrayfunc_sql_expr(op: str, p: dict) -> str:
    a, l = p["a"], p["l"]
    s1 = f"w[{a}:{a + l - 1}]"
    s2 = f"w[{a + 1}:{a + l}]"
    if op == "size":
        return "CAST(len(w) AS BIGINT)"
    if op == "slice_join":
        return f"array_to_string({s1}, '-')"
    if op == "elem":
        return f"w[{p['k']}]"
    if op == "contains":
        return f"list_contains(w, '{p['tok']}')"
    if op == "position":
        # both engines encode absence as 0 (DuckDB ≥1.0 matches Spark
        # here — older DuckDB returned NULL); normalize to NULL anyway
        # so the case stays version-proof
        return f"CAST(NULLIF(list_position(w, '{p['tok']}'), 0) AS BIGINT)"
    if op == "filt_count":
        return (
            f"CAST(len(list_filter(w, x -> length(x) >= {p['c']})) AS BIGINT)"
        )
    if op == "agg_len":
        # COALESCE: Spark's fold over an empty token list returns init 0
        return (
            "CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0)"
            " AS BIGINT)"
        )
    if op == "distinct_sorted":
        return "array_to_string(list_sort(list_distinct(w)), '-')"
    if op == "seq_sum":
        return (
            f"CAST(list_sum(generate_series({p['lo']}, {p['hi']})) AS BIGINT)"
        )
    if op == "reverse_join":
        return "array_to_string(list_reverse(w), '-')"
    if op == "union_sorted":
        return (
            f"array_to_string(list_sort(list_distinct(list_concat("
            f"{s1}, {s2}))), '-')"
        )
    # zip_len_sum: a slice zipped with its own reverse — guaranteed
    # equal lengths, so neither engine NULL-pads (Spark's fold would
    # NULL the whole sum; DuckDB's list_sum skips NULLs — a divergence
    # this family deliberately keeps out of scope by construction).
    # COALESCE covers the EMPTY slice (doc shorter than 'a' tokens):
    # Spark's fold returns its init 0 there, DuckDB list_sum(()) NULL.
    return (
        f"CAST(COALESCE(list_sum(list_transform("
        f"list_zip({s1}, list_reverse({s1})), "
        f"p -> length(p[1]) + length(p[2]))), 0) AS BIGINT)"
    )


def arrayfunc_to_sql(case: dict) -> str:
    ops, params, (m, r) = case["arrayfunc"]
    sel = ", ".join(
        f"{_arrayfunc_sql_expr(op, params)} AS c{i}" for i, op in enumerate(ops)
    )
    return (
        f"SELECT doc_id, {sel} FROM "
        f"(SELECT doc_id, string_split(text, ' ') AS w FROM documents) "
        f"WHERE doc_id % {m} = {r} ORDER BY doc_id"
    )


def build_arrayfunc_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    ops, params, (m, r) = case["arrayfunc"]
    a, l = params["a"], params["l"]

    def s1():
        return F.slice(F.col("w"), a, l)

    def s2():
        return F.slice(F.col("w"), a + 1, l)

    def expr(op):
        if op == "size":
            return F.size("w").cast("long")
        if op == "slice_join":
            return F.array_join(s1(), "-")
        if op == "elem":
            return F.try_element_at("w", F.lit(params["k"]))
        if op == "contains":
            return F.array_contains("w", F.lit(params["tok"]))
        if op == "position":
            # Spark encodes absence as 0, DuckDB as NULL — normalize
            return F.nullif(
                F.array_position("w", params["tok"]), F.lit(0)
            ).cast("long")
        if op == "filt_count":
            return F.size(
                F.filter(F.col("w"), lambda x: F.length(x) >= params["c"])
            ).cast("long")
        if op == "agg_len":
            return F.aggregate(
                F.col("w"),
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.length(x),
            )
        if op == "distinct_sorted":
            return F.array_join(F.array_sort(F.array_distinct("w")), "-")
        if op == "seq_sum":
            return F.aggregate(
                F.sequence(F.lit(params["lo"]), F.lit(params["hi"])),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        if op == "reverse_join":
            return F.array_join(F.reverse("w"), "-")
        if op == "union_sorted":
            return F.array_join(
                F.array_sort(F.array_distinct(F.concat(s1(), s2()))), "-"
            )
        return F.aggregate(  # zip_len_sum: slice zipped with own reverse
            F.zip_with(
                s1(), F.reverse(s1()), lambda x, y: F.length(x) + F.length(y)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .where(F.col("doc_id") % m == r)
        .select(
            "doc_id", *[expr(op).alias(f"c{i}") for i, op in enumerate(ops)]
        )
        .orderBy("doc_id")
    )



_BITFUNC_OPS = [
    "xor_cnt", "and_mask", "or_shift", "not_low", "shl",
    "neg_shr", "neg_cnt", "parity", "nth_bit", "signmod",
]


def gen_bitfunc_case(rng: random.Random) -> dict:
    """Bitwise/bit-count seams — the 19th family, added the round the
    catalog gained sign-bit binary quantization (embedding_sign_bits /
    ann_hamming_topk), whose correctness rests on xor/bit_count/shift
    agreeing cross-engine. Probed semantics, all verified identical by
    construction here: two's-complement bit_count (bit_count(-1) = 64
    both), ARITHMETIC right shift on negatives (-8 >> 1 = -4 both),
    sign-of-dividend % (-7 % 3 = -1 both), and the safe << regime
    (operand < 2^16, shift <= 15 — far from signed-64 overflow, where
    the engines' overflow behavior DOES differ: Spark wraps, DuckDB
    raises)."""
    ops = rng.sample(_BITFUNC_OPS, k=rng.randint(2, 4))
    params = {
        "c1": rng.randint(1, 10**6),
        "k": rng.randint(0, 15),
        "mask": rng.choice([255, 4095, 65535, 2**20 - 1]),
        "m2": rng.choice([3, 5, 7, 11]),
    }
    resid = (rng.choice([2, 3, 5]), rng.randint(0, 1))
    return {"bitfunc": (ops, params, resid)}


def _bitfunc_sql_expr(op: str, p: dict) -> str:
    # u, v: well-mixed non-negative < 2^32; n: possibly negative
    if op == "xor_cnt":
        return "CAST(bit_count(xor(u, v)) AS BIGINT)"
    if op == "and_mask":
        return f"CAST(u & {p['mask']} AS BIGINT)"
    if op == "or_shift":
        return f"CAST((u | v) >> {p['k']} AS BIGINT)"
    if op == "not_low":
        return "CAST(~u & 65535 AS BIGINT)"
    if op == "shl":
        return f"CAST((u % 65536) << {p['k']} AS BIGINT)"
    if op == "neg_shr":
        return f"CAST(n >> {p['k']} AS BIGINT)"
    if op == "neg_cnt":
        return "CAST(bit_count(n) AS BIGINT)"
    if op == "parity":
        return "CAST(bit_count(u) % 2 AS BIGINT)"
    if op == "nth_bit":
        return f"CAST((u >> {p['k']}) & 1 AS BIGINT)"
    # signmod: sign-of-dividend remainder on a negative operand
    return f"CAST(n % {p['m2']} AS BIGINT)"


def bitfunc_to_sql(case: dict) -> str:
    ops, params, (m, r) = case["bitfunc"]
    sel = ", ".join(
        f"{_bitfunc_sql_expr(op, params)} AS c{i}" for i, op in enumerate(ops)
    )
    return (
        f"SELECT o_orderkey, {sel} FROM "
        f"(SELECT o_orderkey, "
        f" CAST((o_orderkey * 2654435761 + {params['c1']}) % 4294967296 AS BIGINT) AS u, "
        f" CAST((o_orderkey * 40503 + {params['c1']} * 7) % 4294967296 AS BIGINT) AS v, "
        f" CAST((o_orderkey * 2654435761 + {params['c1']}) % 4294967296 - 2147483648 AS BIGINT) AS n "
        f" FROM orders) "
        f"WHERE o_orderkey % {m} = {r} ORDER BY o_orderkey"
    )


def build_bitfunc_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    ops, params, (m, r) = case["bitfunc"]
    k, mask, m2 = params["k"], params["mask"], params["m2"]

    def expr(op):
        u, v, n = F.col("u"), F.col("v"), F.col("n")
        if op == "xor_cnt":
            return F.bit_count(u.bitwiseXOR(v)).cast("long")
        if op == "and_mask":
            return u.bitwiseAND(F.lit(mask)).cast("long")
        if op == "or_shift":
            return F.shiftright(u.bitwiseOR(v), k).cast("long")
        if op == "not_low":
            return F.bitwise_not(u).bitwiseAND(F.lit(65535)).cast("long")
        if op == "shl":
            return F.shiftleft(u % 65536, k).cast("long")
        if op == "neg_shr":
            return F.shiftright(n, k).cast("long")
        if op == "neg_cnt":
            return F.bit_count(n).cast("long")
        if op == "parity":
            return (F.bit_count(u).cast("long") % 2).cast("long")
        if op == "nth_bit":
            return F.shiftright(u, k).bitwiseAND(F.lit(1)).cast("long")
        return (n % m2).cast("long")

    c1 = params["c1"]
    base = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .where(F.col("o_orderkey") % m == r)
        .select(
            "o_orderkey",
            ((F.col("o_orderkey") * 2654435761 + c1) % 4294967296)
            .cast("long")
            .alias("u"),
            ((F.col("o_orderkey") * 40503 + c1 * 7) % 4294967296)
            .cast("long")
            .alias("v"),
            (
                (F.col("o_orderkey") * 2654435761 + c1) % 4294967296
                - 2147483648
            )
            .cast("long")
            .alias("n"),
        )
    )
    return base.select(
        "o_orderkey", *[expr(op).alias(f"c{i}") for i, op in enumerate(ops)]
    ).orderBy("o_orderkey")


def gen_window_case(rng: random.Random) -> dict:
    """Random window query: ROW_NUMBER/SUM/LAG over a string-partitioned
    window ordered by a UNIQUE integer key (determinism across engines),
    filtered to the first k rows per partition. Probes frame semantics,
    partition pruning of window output, and rank-filter rewrites."""
    table = rng.choice([t for t in UNIQUE_KEYS if TABLES[t]["str"]])
    cols = TABLES[table]
    part = rng.choice(cols["str"])
    key = UNIQUE_KEYS[table]  # compound key → total order within partition
    fn = rng.choice(["row_number", "sum", "lag"])
    val = rng.choice(cols["num"] + cols["int"])
    k = rng.choice([3, 5])
    return {"window": (table, part, key, fn, val, k)}


def window_to_sql(case: dict) -> str:
    table, part, key, fn, val, k = case["window"]
    ks = ", ".join(key)
    if fn == "row_number":
        expr = "ROW_NUMBER() OVER w"
    elif fn == "sum":
        expr = (f"SUM({val}) OVER (PARTITION BY {part} ORDER BY {ks} "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    else:
        expr = f"LAG({val}, 1) OVER w"
    return (
        f"SELECT {part}, {ks}, ROUND(CAST(v AS DOUBLE), 4) AS v FROM "
        f"(SELECT {part}, {ks}, {expr} AS v, ROW_NUMBER() OVER w AS rn "
        f"FROM {table} WINDOW w AS (PARTITION BY {part} ORDER BY {ks})) t "
        f"WHERE rn <= {k} ORDER BY {part}, {ks}"
    )


def build_window_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    table, part, key, fn, val, k = case["window"]
    w = Window.partitionBy(part).orderBy(*key)
    df = load_table(spark, sf_dir, table)
    if fn == "row_number":
        v = F.row_number().over(w)
    elif fn == "sum":
        v = F.sum(val).over(w.rowsBetween(Window.unboundedPreceding, 0))
    else:
        v = F.lag(val, 1).over(w)
    return (
        df.select(part, *key, v.alias("v"), F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= k)
        .select(part, *key, F.round(F.col("v").cast("double"), 4).alias("v"))
        .orderBy(part, *key)
    )


def join_to_sql(case: dict) -> str:
    left, right, lk, rk = case["join"]
    how = case.get("how", "inner")
    # LEFT-join right-side filters must live in the ON clause, or they
    # silently convert the join back to inner — a classic SQL footgun
    # the generator sidesteps by only filtering the left side then
    on_extra = ""
    wh = []
    for side, c, op, v in case["filters"]:
        cond = f"{c} {op} '{v}'" if isinstance(v, str) else f"{c} {op} {v}"
        if how == "left" and side == "r":
            on_extra += f" AND {cond}"
        else:
            wh.append(cond)
    where = f" WHERE {' AND '.join(wh)}" if wh else ""
    gcol = case["group"][1]
    sel = [gcol]
    for i, (fn, c) in enumerate(case["aggs"]):
        if c == "*":
            expr = "COUNT(*)"
        elif fn == "count_col":
            expr = f"COUNT({c})"
        else:
            expr = f"{fn.upper()}({c})"
        sel.append(f"CAST({expr} AS DOUBLE) AS a{i}" if fn in ("count_col",) else f"{expr} AS a{i}")
    jw = "LEFT JOIN" if how == "left" else "JOIN"
    return (
        f"SELECT {', '.join(sel)} FROM {left} {jw} {right} ON {lk} = {rk}{on_extra}"
        f"{where} GROUP BY {gcol} ORDER BY {gcol}"
    )


def build_join_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    left, right, lk, rk = case["join"]
    how = case.get("how", "inner")
    l = load_table(spark, sf_dir, left)
    r = load_table(spark, sf_dir, right)
    cond = l[lk] == r[rk]
    pre_where, on_extra = [], []
    for side, c, op, v in case["filters"]:
        col = F.col(c)
        if op == "LIKE":
            expr = col.like(v)
        elif op == ">":
            expr = col > v
        elif op == "<":
            expr = col < v
        else:  # keep Spark side in lockstep with the generated SQL
            raise ValueError(f"unsupported join-filter op: {op!r}")
        if how == "left" and side == "r":
            on_extra.append(expr)
        else:
            pre_where.append(expr)
    for e in on_extra:
        cond = cond & e
    df = l.join(r, cond, how)
    for e in pre_where:
        df = df.filter(e)
    gcol = case["group"][1]
    ag = []
    for i, (fn, c) in enumerate(case["aggs"]):
        if c == "*":
            ag.append(F.count(F.lit(1)).alias(f"a{i}"))
        elif fn == "count_col":
            ag.append(F.count(c).cast("double").alias(f"a{i}"))
        else:
            ag.append(getattr(F, fn)(c).alias(f"a{i}"))
    return df.groupBy(gcol).agg(*ag).orderBy(gcol)


def to_sql(case: dict) -> str:
    if "gsets" in case:
        return gsets_to_sql(case)
    if "asof" in case:
        return asof_to_sql(case)
    if "interval" in case:
        return interval_to_sql(case)
    if "datetime" in case:
        return datetime_to_sql(case)
    if "having" in case:
        return having_to_sql(case)
    if "join" in case:
        return join_to_sql(case)
    if "window" in case:
        return window_to_sql(case)
    if "rangewin" in case:
        return rangewin_to_sql(case)
    if "strfunc" in case:
        return strfunc_to_sql(case)
    if "numfunc" in case:
        return numfunc_to_sql(case)
    if "decagg" in case:
        return decagg_to_sql(case)
    if "datescalar" in case:
        return datescalar_to_sql(case)
    if "arrayfunc" in case:
        return arrayfunc_to_sql(case)
    if "bitfunc" in case:
        return bitfunc_to_sql(case)
    if "expr" in case:
        return expr_to_sql(case)
    if "rollup" in case:
        return rollup_to_sql(case)
    if "setop" in case:
        return setop_to_sql(case)
    if "subq" in case:
        return subquery_to_sql(case)
    where = " AND ".join(
        f"{c} {op} '{v}'" if isinstance(v, str) else f"{c} {op} {v}"
        for c, op, v in case["filters"]
    )
    where = f" WHERE {where}" if where else ""
    if case["group"]:
        sel = [case["group"]]
        for i, (fn, c) in enumerate(case["aggs"]):
            expr = "COUNT(*)" if c == "*" else f"{fn.upper()}({c})"
            sel.append(f"{expr} AS a{i}")
        order = case["group"]
        sql = (
            f"SELECT {', '.join(sel)} FROM {case['table']}{where} "
            f"GROUP BY {case['group']} ORDER BY {order}"
        )
    else:
        sel = ", ".join(case["proj"])
        order = ", ".join(case["proj"])
        sql = f"SELECT {sel} FROM {case['table']}{where} ORDER BY {order}"
    if case["limit"]:
        # a bare LIMIT after ORDER BY on possibly-duplicated keys is
        # nondeterministic across engines; only apply when the sort
        # prefix is a unique key (grouped output is unique per group key)
        if case["group"]:
            sql += f" LIMIT {case['limit']}"
    return sql


def build_spark_df(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from overseer_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, case["table"])
    for c, op, v in case["filters"]:
        col = F.col(c)
        if op == "=":
            df = df.filter(col == v)
        elif op == "<>":
            df = df.filter(col != v)
        elif op == "LIKE":
            df = df.filter(col.like(v))
        elif op == "<":
            df = df.filter(col < v)
        elif op == "<=":
            df = df.filter(col <= v)
        elif op == ">":
            df = df.filter(col > v)
        elif op == ">=":
            df = df.filter(col >= v)
    if case["group"]:
        ag = []
        for i, (fn, c) in enumerate(case["aggs"]):
            if c == "*":
                ag.append(F.count(F.lit(1)).alias(f"a{i}"))
            else:
                ag.append(getattr(F, fn)(c).alias(f"a{i}"))
        df = df.groupBy(case["group"]).agg(*ag).orderBy(case["group"])
        if case["limit"]:
            df = df.limit(case["limit"])
    else:
        df = df.select(*case["proj"]).orderBy(*case["proj"])
    return df


def _close(a, b, tol=1e-6) -> bool:
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return str(a) == str(b)
    if fa == fb:
        return True
    return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))


def run_case(
    spark, con, sf_dir: str, seed: int, family: str | None = None
) -> tuple[bool, str]:
    rng = random.Random(seed)
    case = gen_case(rng, family)
    sql = to_sql(case)
    if "gsets" in case:
        srows = build_gsets_spark_df(spark, sf_dir, case).collect()
    elif "asof" in case:
        srows = build_asof_spark_df(spark, sf_dir, case).collect()
    elif "interval" in case:
        srows = build_interval_spark_df(spark, sf_dir, case).collect()
    elif "datetime" in case:
        srows = build_datetime_spark_df(spark, sf_dir, case).collect()
    elif "having" in case:
        srows = build_having_spark_df(spark, sf_dir, case).collect()
    elif "join" in case:
        srows = build_join_spark_df(spark, sf_dir, case).collect()
    elif "window" in case:
        srows = build_window_spark_df(spark, sf_dir, case).collect()
    elif "rangewin" in case:
        srows = build_rangewin_spark_df(spark, sf_dir, case).collect()
    elif "strfunc" in case:
        srows = build_strfunc_spark_df(spark, sf_dir, case).collect()
    elif "numfunc" in case:
        srows = build_numfunc_spark_df(spark, sf_dir, case).collect()
    elif "decagg" in case:
        srows = build_decagg_spark_df(spark, sf_dir, case).collect()
    elif "datescalar" in case:
        srows = build_datescalar_spark_df(spark, sf_dir, case).collect()
    elif "arrayfunc" in case:
        srows = build_arrayfunc_spark_df(spark, sf_dir, case).collect()
    elif "bitfunc" in case:
        srows = build_bitfunc_spark_df(spark, sf_dir, case).collect()
    elif "expr" in case:
        srows = build_expr_spark_df(spark, sf_dir, case).collect()
    elif "rollup" in case:
        srows = build_rollup_spark_df(spark, sf_dir, case).collect()
    elif "setop" in case:
        srows = build_setop_spark_df(spark, sf_dir, case).collect()
    elif "subq" in case:
        srows = build_subquery_spark_df(spark, sf_dir, case).collect()
    else:
        srows = build_spark_df(spark, sf_dir, case).collect()
    drows = con.execute(sql).fetchall()
    if "gsets" in case or "asof" in case or "interval" in case:
        # exact integer/string rows: order-insensitive multiset compare
        s_ = sorted(tuple(str(x) for x in r) for r in srows)
        d_ = sorted(tuple(str(x) for x in r) for r in drows)
        if s_ != d_:
            diff = next((p for p in zip(s_, d_) if p[0] != p[1]), None)
            return (
                False,
                f"seed={seed} sql={sql!r} rows={len(s_)}/{len(d_)} first_diff={diff}",
            )
        return (True, f"seed={seed} sql={sql!r} rows={len(s_)}")
    if "having" in case or "datetime" in case:
        if len(srows) != len(drows):
            return (False, f"seed={seed} sql={sql!r} rowcount {len(srows)} != {len(drows)}")
        for sr, dr in zip(srows, drows):
            for x, y in zip(tuple(sr), dr):
                if not _close(x, y):
                    return (False, f"seed={seed} sql={sql!r} value {x!r} != {y!r}")
        return (True, f"seed={seed} sql={sql!r} rows={len(srows)}")
    if "setop" in case:
        s_ = sorted(str(r[0]) for r in srows)
        d_ = sorted(str(r[0]) for r in drows)
        return (s_ == d_, f"seed={seed} sql={sql!r} rows={len(s_)}/{len(d_)}")
    if "subq" in case:
        s_ = sorted(tuple(str(x) for x in r) for r in srows)
        d_ = sorted(tuple(str(x) for x in r) for r in drows)
        return (s_ == d_, f"seed={seed} sql={sql!r} rows={len(s_)}/{len(d_)}")
    if "strfunc" in case or "arrayfunc" in case:
        # unique-keyed ORDER BY + exact strings/ints/bools/NULLs: in order
        s_ = [tuple(str(x) for x in r) for r in srows]
        d_ = [tuple(str(x) for x in r) for r in drows]
        if s_ != d_:
            diff = next((p for p in zip(s_, d_) if p[0] != p[1]), None)
            return (
                False,
                f"seed={seed} sql={sql!r} rows={len(s_)}/{len(d_)} first_diff={diff}",
            )
        return (True, f"seed={seed} sql={sql!r} rows={len(s_)}")
    if "numfunc" in case or "datescalar" in case:
        # unique-keyed ORDER BY; doubles (trydiv/lnguard) need tolerance,
        # everything else is exact integers / strings / NULLs
        if len(srows) != len(drows):
            return (False, f"seed={seed} sql={sql!r} rowcount {len(srows)} != {len(drows)}")
        for sr, dr in zip(srows, drows):
            for x, y in zip(tuple(sr), dr):
                if not _close(x, y, tol=1e-12):
                    return (False, f"seed={seed} sql={sql!r} value {x!r} != {y!r}")
        return (True, f"seed={seed} sql={sql!r} rows={len(srows)}")
    if "decagg" in case:
        # money math: EXACT decimal string compare, no float tolerance
        s_ = [tuple(str(x) for x in r) for r in srows]
        d_ = [tuple(str(x) for x in r) for r in drows]
        if s_ != d_:
            diff = next((p for p in zip(s_, d_) if p[0] != p[1]), None)
            return (
                False,
                f"seed={seed} sql={sql!r} rows={len(s_)}/{len(d_)} first_diff={diff}",
            )
        return (True, f"seed={seed} sql={sql!r} rows={len(s_)}")
    if "rollup" in case or "rangewin" in case:
        # ORDER BY yields a total order up to identical rows (RANGE-frame
        # peers share v by construction), so pairwise compare is sound
        if len(srows) != len(drows):
            return (False, f"seed={seed} sql={sql!r} rowcount {len(srows)} != {len(drows)}")
        for sr, dr in zip(srows, drows):
            for x, y in zip(tuple(sr), dr):
                if not _close(x, y, tol=1e-9):
                    return (False, f"seed={seed} sql={sql!r} value {x!r} != {y!r}")
        return (True, f"seed={seed} sql={sql!r} rows={len(srows)}")
    if "expr" in case:
        if len(srows) != len(drows):
            return (False, f"seed={seed} sql={sql!r} rowcount {len(srows)} != {len(drows)}")
        for sr, dr in zip(srows, drows):
            for x, y in zip(tuple(sr), dr):
                if not _close(x, y, tol=1e-9):
                    return (False, f"seed={seed} sql={sql!r} value {x!r} != {y!r}")
        return (True, f"seed={seed} sql={sql!r} rows={len(srows)}")
    if "window" in case:
        # deterministic unique-key rows: exact multiset compare with the
        # rounded value column
        s_ = sorted(tuple(str(x) for x in r) for r in srows)
        d_ = sorted(tuple(str(x) for x in r) for r in drows)
        return (s_ == d_, f"seed={seed} sql={sql!r} rows={len(s_)}/{len(d_)}")
    if case.get("group") is None:
        # un-grouped projections: compare as sorted multisets
        s = sorted(tuple(str(x) for x in r) for r in srows)
        d = sorted(tuple(str(x) for x in r) for r in drows)
        return (s == d, f"seed={seed} sql={sql!r} rows={len(s)}/{len(d)}")
    if len(srows) != len(drows):
        return (False, f"seed={seed} sql={sql!r} rowcount {len(srows)} != {len(drows)}")
    for sr, dr in zip(srows, drows):
        for x, y in zip(tuple(sr), dr):
            if not _close(x, y):
                return (False, f"seed={seed} sql={sql!r} value {x!r} != {y!r}")
    return (True, f"seed={seed} sql={sql!r} rows={len(srows)}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--family",
        choices=["gsets", "asofjoin", "rangewin", "strfunc", "numfunc",
                 "decagg", "datescalar", "arrayfunc", "bitfunc"],
        help="force every case into one generator (dedicated family sweeps)",
    )
    ns = ap.parse_args()

    import duckdb

    from overseer_spark.session import get_spark

    spark = get_spark("fuzz-differential", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in list(TABLES) + ["customer"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{ns.sf}/{t}.parquet'")
    bad = 0
    for i in range(ns.n):
        ok, detail = run_case(spark, con, ns.sf, ns.seed + i, ns.family)
        print(("PASS " if ok else "FAIL ") + detail)
        bad += 0 if ok else 1
    print(f"{ns.n - bad}/{ns.n} passed")
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
