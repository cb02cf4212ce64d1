"""grouped_apply_batched must be row-for-row equivalent to
groupBy().applyInPandas() — including groups that span Arrow batch
boundaries (forced via tiny maxRecordsPerBatch)."""

from __future__ import annotations

import pandas as pd
import pytest

from overseer_spark.operators.util import grouped_apply_batched


def make_fn():
    # defined per call-site closure so cloudpickle serializes it by value
    # (module-level test functions aren't importable on executors)
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        return _pd.DataFrame(
            {
                "k": pdf["k"].iloc[:1],
                "n": [len(pdf)],
                "s": [float(pdf["v"].sum())],
            }
        )

    return fn


@pytest.fixture(scope="module")
def data(spark):
    rows = [(f"k{i % 37:02d}", i, float(i) / 7) for i in range(5000)]
    return spark.createDataFrame(rows, schema="k string, i long, v double")


def _norm(rows):
    return sorted(tuple(str(x) for x in r) for r in rows)


def test_matches_apply_in_pandas(spark, data):
    df = data.select("k", "v")
    fn = make_fn()
    want = df.groupBy("k").applyInPandas(fn, schema="k string, n long, s double")
    got = grouped_apply_batched(df, ["k"], fn, schema="k string, n long, s double")
    assert _norm(got.collect()) == _norm(want.collect())


def test_group_spanning_batches(spark, data):
    """With 100-row Arrow batches every group (135 rows) straddles a batch
    boundary, exercising the carry-over path."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = data.select("k", "v")
        got = grouped_apply_batched(
            df, ["k"], make_fn(), schema="k string, n long, s double", num_partitions=3
        )
        out = {r["k"]: (r["n"], round(r["s"], 6)) for r in got.collect()}
        pdf = df.toPandas()
        want = {
            k: (len(g), round(float(g["v"].sum()), 6))
            for k, g in pdf.groupby("k")
        }
        assert out == want
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_empty_input(spark):
    df = spark.createDataFrame([], schema="k string, v double")
    got = grouped_apply_batched(df, ["k"], make_fn(), schema="k string, n long, s double")
    assert got.count() == 0


def test_per_group_false_matches_per_group_true(spark, data):
    """Vectorized whole-batch mode must produce the same rows as the
    per-group loop — groups still arrive complete and key-sorted."""

    def loop_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        return _pd.DataFrame(
            {"k": pdf["k"].iloc[:1], "s": [float(pdf["v"].sum())]}
        )

    def vec_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.groupby("k", sort=False)["v"].sum().reset_index()
        return out.rename(columns={"v": "s"})

    schema = "k string, s double"
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        a = grouped_apply_batched(data, ["k"], loop_fn, schema).collect()
        b = grouped_apply_batched(data, ["k"], vec_fn, schema, per_group=False).collect()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    # pairwise vs cython summation differ in the last ulp — compare rounded
    na = sorted((r["k"], round(r["s"], 6)) for r in a)
    nb = sorted((r["k"], round(r["s"], 6)) for r in b)
    assert na == nb
    assert len(b) == 37


def test_ewma_matches_pandas_oracle(spark):
    """PY-tier oracle for the ewma_user_value catalog entry: the
    distributed batched-seam result equals a single-process pandas
    computation over the same rows."""
    import pandas as pd

    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_CORRECTNESS

    got = {
        r.user_id: (r.n, r.level)
        for r in CATALOG["ewma_user_value"].fn(spark, SF_CORRECTNESS).collect()
    }

    raw = (
        spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
    )
    expected = {}
    for uid, g in raw.sort_values(["ts", "event_id"]).groupby("user_id"):
        lvl = g["value"].ewm(alpha=0.3, adjust=False).mean().iloc[-1]
        expected[uid] = (len(g), round(float(lvl), 4))
    assert got == expected
