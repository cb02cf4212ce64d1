"""Real-boundary paragraph/sentence semantics on a punctuated fixture.

The driver fixtures carry no punctuation, so the catalog's paragraph
entry honestly proxies paragraphs as 8-token chunks. This suite gives the
REAL semantics their gate: a deterministic punctuated corpus (sentences,
blank-line paragraphs, planted verbatim boilerplate — the same structure
tools/gen_scale_data.py now plants in the 10x fixture) drives
boundary-mode paragraph dedup against a DuckDB replay, and asserts the
output is NON-degenerate (multiple paragraphs per doc, boilerplate
detected as corpus-wide repeats) — not just hash-equal on vacuous input.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from overseer_spark.operators.text import (
    paragraph_dedup_stats,
    split_paragraphs,
    split_sentences,
)

BOILER = "subscribe to our newsletter for updates and exclusive content."

DOCS = [
    # (doc_id, source, text) — sentences '.'-terminated, paragraphs
    # separated by blank lines; BOILER planted verbatim on 3 docs
    (0, "web", f"{BOILER} \n\n alpha beta gamma delta epsilon zeta eta theta. "
               "iota kappa lambda mu nu xi omicron pi."),
    (1, "web", "alpha beta gamma delta epsilon zeta eta theta. "
               "rho sigma tau upsilon phi chi psi omega. \n\n "
               f"{BOILER}"),
    (2, "web", "one two three four five six seven eight. nine ten eleven "
               "twelve thirteen fourteen. \n\n fifteen sixteen seventeen "
               "eighteen nineteen twenty twentyone."),
    (3, "wiki", f"{BOILER} \n\n solo paragraph with its own words here."),
    (4, "wiki", "first wiki sentence goes here today. second wiki sentence "
                "follows it closely. \n\n third paragraph stands alone "
                "with enough characters."),
]


@pytest.fixture(scope="module")
def punct_docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, source string, text string"
    ).cache()


def test_split_paragraphs_and_sentences_non_degenerate(spark, punct_docs):
    n_paras = punct_docs.select(
        F.size(F.filter(split_paragraphs(F.col("text")), lambda p: p != ""))
        .alias("np")
    ).collect()
    assert [r["np"] for r in n_paras] == [2, 2, 2, 2, 2]
    n_sents = punct_docs.select(
        F.size(F.filter(split_sentences(F.col("text")), lambda s: s != ""))
        .alias("ns"),
        "doc_id",
    ).collect()
    by_id = {r["doc_id"]: r["ns"] for r in n_sents}
    assert by_id[0] == 3 and by_id[2] == 3  # boiler + 2 body sentences
    assert all(v >= 2 for v in by_id.values())


def test_boundary_mode_matches_duckdb_and_finds_boilerplate(
    spark, punct_docs, tmp_path
):
    path = str(tmp_path / "documents.parquet")
    punct_docs.write.parquet(path)
    got = sorted(
        tuple(r) for r in paragraph_dedup_stats(
            punct_docs, boundary="paragraphs"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """WITH para AS (
                 SELECT source, md5(p) AS h
                 FROM (SELECT source, trim(u.p) AS p
                       FROM documents,
                            LATERAL unnest(regexp_split_to_array(
                              text, '\n{2,}')) AS u(p))
                 WHERE length(p) > 20),
               g AS (SELECT h, source, CAST(COUNT(*) AS BIGINT) AS n
                     FROM para GROUP BY h, source),
               w AS (SELECT h, source, n,
                            SUM(n) OVER (PARTITION BY h) AS total FROM g)
               SELECT source,
                      CAST(SUM(n) AS BIGINT) AS n_paras,
                      CAST(SUM(CASE WHEN total >= 2 THEN n ELSE 0 END)
                           AS BIGINT) AS n_repeated,
                      ROUND(CAST(SUM(CASE WHEN total >= 2 THEN n ELSE 0 END)
                                 AS DOUBLE) / SUM(n), 4) AS dup_ratio,
                      CAST(COUNT(DISTINCT CASE WHEN total >= 2 THEN h END)
                           AS BIGINT) AS distinct_repeated
               FROM w GROUP BY source ORDER BY source"""
        ).fetchall()
    )
    assert got == want
    stats = {r[0]: r for r in got}
    # the planted boilerplate paragraph repeats across sources: both see
    # repeated instances and exactly ONE distinct repeated hash
    assert stats["web"][2] == 2 and stats["web"][4] == 1
    assert stats["wiki"][2] == 1 and stats["wiki"][4] == 1
    assert stats["web"][1] > stats["web"][2]  # non-repeat body paragraphs


def test_chunk_mode_unchanged_for_driver_fixture(spark):
    """The factored chunks mode must reproduce the catalog entry's
    pre-refactor output on the driver fixture (the entry's oracle gate)."""
    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_CORRECTNESS

    spec = CATALOG["text_paragraph_dedup_stats"]
    got = [tuple(r) for r in spec.fn(spark, SF_CORRECTNESS).collect()]
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECTNESS}/{t}.parquet'"
        )
    want = [tuple(r) for r in con.execute(spec.oracle).fetchall()]
    assert got == want
