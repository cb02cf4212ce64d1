"""Invariants of the composed training-data prep pipeline entry
(train_prep_pipeline): stage monotonicity, packing feasibility, and
consistency with the individual operators it chains.
"""

from __future__ import annotations

import math

from overseer_spark.queries.catalog import CATALOG
from tests.conftest import SF_CORRECTNESS


def test_train_prep_funnel_invariants(spark):
    rows = {r.stage: r.n for r in CATALOG["train_prep_pipeline"].fn(spark, SF_CORRECTNESS).collect()}
    assert set(rows) == {
        "0_input",
        "1_quality",
        "2_exact_dedup",
        "3_near_dedup",
        "4_total_tokens",
        "5_packs",
    }
    # each stage can only shrink the corpus
    assert rows["0_input"] >= rows["1_quality"] >= rows["2_exact_dedup"] >= rows["3_near_dedup"] > 0
    # packing: at least ceil(tokens/capacity) packs, at most one per doc
    assert rows["5_packs"] >= math.ceil(rows["4_total_tokens"] / 512)
    assert rows["5_packs"] <= rows["3_near_dedup"]


def test_train_prep_stages_match_individual_operators(spark):
    """The funnel numbers equal running the chained operators directly."""
    from pyspark.sql import functions as F

    from overseer_spark.operators.components import dedup_keep_canonical
    from overseer_spark.operators.dedup import dedup_exact, jaccard_pairs
    from overseer_spark.operators.text import quality_filter
    from overseer_spark.sources.tables import load_table

    rows = {r.stage: r.n for r in CATALOG["train_prep_pipeline"].fn(spark, SF_CORRECTNESS).collect()}
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    kept = quality_filter(docs)
    exact = dedup_exact(kept)
    near = dedup_keep_canonical(exact, jaccard_pairs(exact, threshold=0.8))
    assert rows["1_quality"] == kept.count()
    assert rows["2_exact_dedup"] == exact.count()
    assert rows["3_near_dedup"] == near.count()
