"""Physical-plan regression tests: pin the scale-critical properties of the
catalog's plans (pushdown, pruning, broadcast, partial agg, top-k heap).
A refactor that silently turns a broadcast join into a shuffle join or
loses parquet pushdown fails HERE, not at 100 TB.
"""

from __future__ import annotations

from overseer_spark.plans import (
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
    read_schema_columns,
    uses_take_ordered,
)
from overseer_spark.queries.catalog import CATALOG
from tests.conftest import SF_SMOKE


def q(name, spark):
    return CATALOG[name].fn(spark, SF_SMOKE)


def test_q02_filter_pushdown_and_column_pruning(spark):
    df = q("q02_projection_filter", spark)
    assert any("l_quantity" in f for f in pushed_filters(df)), "filter not pushed to scan"
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity"}, (
        f"scan reads {cols}, expected exactly the projected columns"
    )


def test_q03_string_filter_pushdown(spark):
    assert any("c_mktsegment" in f for f in pushed_filters(q("q03_string_filter", spark)))


def test_q07_broadcasts_dimension(spark):
    assert has_broadcast_join(q("q07_inner_join", spark)), "nation should broadcast"


def test_q08_multiway_broadcasts(spark):
    assert has_broadcast_join(q("q08_multiway_join", spark))


def test_q14_partial_aggregation(spark):
    assert has_partial_aggregation(q("q14_grouped_agg", spark)), (
        "grouped agg must map-side combine before the shuffle"
    )


def test_q23_topk_avoids_full_sort(spark):
    assert uses_take_ordered(q("q23_topk", spark)), (
        "ORDER BY+LIMIT must plan as TakeOrderedAndProject"
    )


def test_q31_ready_set_is_anti_join(spark):
    from overseer_spark.plans import explain_str

    text = explain_str(q("q31_ready_set", spark))
    assert "LeftAnti" in text and "LeftSemi" in text


def test_scan_count_prunes_all_columns(spark):
    cols = read_schema_columns(q("q01_scan_count", spark))
    assert cols == [], f"COUNT(*) should read no columns, reads {cols}"
