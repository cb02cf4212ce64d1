"""Expectations engine: each rule kind pinned with synthetic violations,
and the single-pass plan property for row-local rules."""

from __future__ import annotations

from overseer_spark.operators import expectations as DQ


def _report(df, rules):
    return {r["rule"]: r["violations"] for r in DQ.check(df, rules).collect()}


def test_each_rule_kind_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "A", "ok@x.io"),
            (2, -5, "B", "bad"),        # range + set violations
            (2, 200, "A", None),        # dup id, range, null email
            (3, 25, None, "c@d.org"),   # null flag → set violation
        ],
        "id long, qty long, flag string, email string",
    )
    ref = spark.createDataFrame([(1,), (2,)], "id long")
    got = _report(
        df,
        [
            DQ.in_range("qty_range", "qty", 0, 100),
            DQ.in_set("flag_ab", "flag", ["A", "B"]),
            DQ.not_null("email_nn", "email"),
            DQ.matches("email_shape", "email", r"^[^@]+@[^@]+\.[a-z]+$"),
            DQ.unique("id_unique", "id"),
            DQ.ref_integrity("id_ref", "id", ref, "id"),
        ],
    )
    assert got == {
        "qty_range": 2,     # -5 and 200
        "flag_ab": 1,       # null flag
        "email_nn": 1,
        "email_shape": 2,   # 'bad' + null
        "id_unique": 1,     # one extra copy of id 2
        "id_ref": 1,        # id 3 unmatched
    }


def test_clean_table_reports_all_zero(spark):
    df = spark.createDataFrame([(1, 5), (2, 7)], "id long, v long")
    got = _report(
        df,
        [
            DQ.in_range("v_range", "v", 0, 10),
            DQ.not_null("id_nn", "id"),
            DQ.unique("id_unique", "id"),
        ],
    )
    assert got == {"v_range": 0, "id_nn": 0, "id_unique": 0}


def test_row_local_rules_fold_into_one_aggregate(spark):
    """All row-local rules must share a single scan+agg — no per-rule pass."""
    import contextlib
    import io

    df = spark.range(100).selectExpr("id", "id % 10 as v")
    plan_df = DQ.check(
        df,
        [
            DQ.in_range("a", "v", 0, 5),
            DQ.not_null("b", "v"),
            DQ.in_set("c", "v", [1, 2, 3]),
        ],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Scan ") <= 2  # one logical source (AQE may re-list it)
