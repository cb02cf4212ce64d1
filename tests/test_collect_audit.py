"""Driver-materialization gate (tools/collect_audit.py).

Every ``.collect()`` / ``.toPandas()`` a catalog entry performs must be
provably dimension-bounded: by plan shape (aggregate output, LIMIT,
bounded leaf), by a registered runtime proof (WAIVERS — e.g. the
connected-components edge-cap probe), and in all cases by the empirical
ROW_CAP.  The full-catalog sweep (``python tools/collect_audit.py``) is
the per-round discovery tool, like scan_audit; this gate keeps the
property from regressing between sweeps:

- every entry KNOWN to materialize driver state is re-audited live;
- any catalog entry not in collect_audit_pins.json (i.e. added since the
  last full sweep) is audited live too — a new entry that collects
  data-sized input fails here, not at 100 TB.
"""

from __future__ import annotations

import pytest

import json
import pathlib
import sys

from overseer_spark.queries.catalog import CATALOG

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

# Entries observed to perform driver materializations in the round-7 full
# sweep. An entry edited to ADD a collect outside this list is caught by
# the next full sweep; new entries are caught immediately via the pins.
KNOWN_COLLECTORS = [
    "ann_graph_bucketed_index_topk",
    "ann_graph_index_lifecycle",
    "ann_graph_ooc_index_topk",
    "ann_ivf_index_topk",
    "ann_ivf_index_upsert",
    "ann_lsh_topk",
    "ann_pq_rerank_topk",
    "ann_pq_topk",
    "bloom_semi_join_prune",
    "cms_term_counts",
    "dag_components",
    "dag_critical_path",
    "dag_cycle_check",
    "dag_pagerank",
    "dag_slack_analysis",
    "dag_topo_levels",
    "embedding_mmr_topk",
    "embedding_pca_power",
    "er_match_clusters",
    "hard_negative_mining_ann",
    "kmeans_lloyd_iters",
    "multimodal_image_dedup_count",
    "near_dup_components",
    "near_dup_dedup_count",
    "q33_transitive_closure",
    "q_markov_attribution",
    "store_manifest_time_travel",
    "store_time_travel",
    "stream_ann_ingest",
    "stream_graph_ann_ingest",
    "stream_warc_ingest",
    "text_bpe_token_stats",
    "train_prep_pipeline",
]

_PINS = json.loads(
    (pathlib.Path(__file__).parent / "collect_audit_pins.json").read_text()
)


def _assert_all_bounded(sites):
    bad = [s for s in sites if s.verdict not in ("BOUNDED", "WAIVED")]
    assert not bad, (
        "driver materializations without a boundedness proof "
        "(fix the plan, or register a runtime-proof waiver in "
        "tools/collect_audit.py WAIVERS): "
        + "; ".join(f"{s.entry}.{s.method}: {s.reason} rows={s.rows}" for s in bad)
    )


@pytest.mark.slow
def test_known_collector_entries_stay_bounded(spark):
    from collect_audit import audit

    _assert_all_bounded(audit(spark, KNOWN_COLLECTORS))


def test_entries_added_since_last_sweep_are_bounded(spark):
    """New catalog entries (not in collect_audit_pins.json) are audited
    live. After a round's full sweep, refresh the pins:
    python -c "import json, pathlib; from overseer_spark.queries.catalog
    import CATALOG; pathlib.Path('tests/collect_audit_pins.json')
    .write_text(json.dumps(sorted(CATALOG), indent=0))" """
    from collect_audit import audit

    new = [n for n in CATALOG if n not in _PINS]
    if new:
        _assert_all_bounded(audit(spark, new))


def test_walker_classifies_shapes(spark):
    """Unit check of the plan walker: aggregate/limit roots are bounded,
    a raw corpus scan is not, the empirical cap overrides plan shape."""
    from collect_audit import CollectSite, trace_collects

    from overseer_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    sites: list[CollectSite] = []
    with trace_collects("unit", sites):
        docs.groupBy("lang").count().collect()  # Aggregate root
        docs.limit(3).collect()  # GlobalLimit root
        docs.select("doc_id").collect()  # raw relation: unbounded by shape
        docs.take(2)  # take: delegates to limit().collect() in classic mode
    verdicts = [(s.verdict, s.method) for s in sites]
    assert verdicts == [
        ("BOUNDED", "collect"),
        ("BOUNDED", "collect"),
        ("UNBOUNDED", "collect"),
        ("BOUNDED", "collect"),  # take's inner limit().collect()
        ("BOUNDED", "take"),
    ], verdicts


def test_walker_sees_through_cached_and_id_pinned_plans(spark):
    """Round-12 walker upgrades (VERDICT r11 ask #1): an eager-cached
    frame classifies by the plan that was CACHED (InMemoryRelation →
    CachedRDDBuilder.logicalPlan), and a filter pinning a unique fixture
    key to finitely many literal values is bounded by that count — the
    proof batch-id collects (index inserts/upserts) rely on.  A cached
    UNBOUNDED source must stay unbounded, and the key rule must not fire
    for non-key columns or foreign relations."""
    from pyspark.sql import functions as F

    from collect_audit import CollectSite, trace_collects

    from overseer_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    batch = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)).cache()
    batch.count()
    whole = emb.select("vec_id", "label").cache()
    whole.count()
    sites: list[CollectSite] = []
    try:
        with trace_collects("unit", sites):
            batch.select("vec_id").collect()  # cached id-range batch
            emb.filter(F.col("vec_id").isin(3, 7, 11)).collect()  # IN-list
            whole.select("vec_id").collect()  # cached CORPUS: unbounded
            emb.filter(F.col("label") == 2).collect()  # non-key column
    finally:
        batch.unpersist()
        whole.unpersist()
    verdicts = [(s.verdict, s.rows is not None) for s in sites]
    assert verdicts == [
        ("BOUNDED", True),
        ("BOUNDED", True),
        ("UNBOUNDED", True),
        ("UNBOUNDED", True),
    ], [(s.verdict, s.reason) for s in sites]
    assert "InMemoryRelation[Filter pins unique key vec_id" in sites[0].reason
    assert "Filter pins unique key vec_id of embeddings to <= 3" in sites[1].reason


def test_waivers_reference_live_entries():
    """A waiver for a deleted/renamed entry is stale documentation."""
    from collect_audit import WAIVERS

    stale = [n for n in WAIVERS if n not in CATALOG]
    assert not stale, f"waivers for unknown entries: {stale}"
