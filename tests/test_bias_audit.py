"""quality_filter_bias_audit: the four-fifths flag must TRIP on a biased
corpus — the driver fixture's languages pass at similar rates (flag 0
everywhere, impact ratios ~0.89-1.0), so this crafted fixture is the
gate proving the flag is live, not vacuously zero."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from overseer_spark.queries.catalog import CATALOG

NAME = "quality_filter_bias_audit"


@pytest.fixture(scope="module")
def biased_dir(spark):
    d = tempfile.mkdtemp(prefix="bias_audit_")
    rows = [
        (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
         "en", "s0")
        for i in range(20)
    ] + [
        # 12 tokens, 1 distinct: distinct_ratio 1/12 <= 0.2 trips the
        # repetition gate, zeroing the composite score — so lang xx's
        # pass rate is 0 (it is the gate, not the stopword discount,
        # that fails these docs; ADVICE r8 corrected this comment)
        (100 + i, "the the the the the the the the the the the the",
         "xx", "s1")
        for i in range(10)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(f"{d}/documents.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_four_fifths_flag_trips_and_oracle_matches(spark, biased_dir):
    spec = CATALOG[NAME]
    out = {r["lang"]: r for r in spec.fn(spark, biased_dir).collect()}
    assert out["xx"]["four_fifths_flag"] == 1
    assert out["en"]["four_fifths_flag"] == 0
    assert out["xx"]["pass_rate"] < 0.8 * out["en"]["pass_rate"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{biased_dir}/documents.parquet/*.parquet'"
    )
    got = sorted(tuple(r) for r in spec.fn(spark, biased_dir).collect())
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want
