"""The local mirror of the driver's t2 gate: every SQL-tier catalog query
runs on Spark AND its oracle on DuckDB over the same parquet tables; row
counts, column names, and order-insensitive values must match.

Values are compared column-name-sorted and normalized (floats to 9 sig
figs after their declared ROUND, timestamps to ISO strings) — stricter than
needed, deliberately.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from overseer_spark.queries.catalog import CATALOG
from tests.conftest import SF_CORRECTNESS

SQL_TIER = [name for name, spec in CATALOG.items() if spec.oracle is not None]
PY_TIER = [name for name, spec in CATALOG.items() if spec.oracle is None]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (int, str)):
        return v
    return str(v)


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


@pytest.mark.parametrize("name", SQL_TIER)
def test_sql_tier_matches_duckdb(name, spark, duck):
    spec = CATALOG[name]
    sdf = spec.fn(spark, SF_CORRECTNESS)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(spec.oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _normalize_rows(spark_cols, spark_rows)
    d = _normalize_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", PY_TIER)
def test_py_tier_runs(name, spark):
    """PY-tier entries must at least run and return a stable schema.
    Their semantic oracles live in the dedicated op test modules."""
    spec = CATALOG[name]
    df = spec.fn(spark, SF_CORRECTNESS)
    assert df.columns
    assert df.count() >= 0
