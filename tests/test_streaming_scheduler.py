"""StreamingWorker: the scheduler as a rate-source Structured Streaming
query — a submitted DAG drains in dependency order across micro-batches."""

from __future__ import annotations

from overseer_spark.config import Config
from overseer_spark.core import STATUS_FINISHED, Job, JobGraph
from overseer_spark.store.memory import MemoryStore
from overseer_spark.streaming.scheduler import StreamingWorker


def test_streaming_worker_drains_dag(spark):
    store = MemoryStore()
    store.install()
    order: list[str] = []
    handlers = {
        "extract": lambda job: order.append("extract"),
        "transform": lambda job: order.append("transform"),
        "load": lambda job: order.append("load"),
    }
    g = JobGraph(
        jobs=[
            Job(id="j-e", type="extract"),
            Job(id="j-t", type="transform"),
            Job(id="j-l", type="load"),
        ],
        edges=[("j-t", "j-e"), ("j-l", "j-t")],
    )
    store.transact_graph(g)
    cfg = Config(detector_sleep_time=1)
    w = StreamingWorker(spark, store, handlers, config=cfg).start()
    try:
        assert w.await_drained(timeout=60), "DAG did not drain"
    finally:
        w.stop()
    assert order == ["extract", "transform", "load"]
    for jid in ("j-e", "j-t", "j-l"):
        assert store.job_info(jid).status == STATUS_FINISHED


def test_streaming_worker_status_query(spark):
    """jobs_with_status (R24) reports the drained state."""
    store = MemoryStore()
    store.install()
    store.transact_graph(JobGraph(jobs=[Job(id="s-1", type="t")], edges=[]))
    cfg = Config(detector_sleep_time=1)
    w = StreamingWorker(spark, store, {"t": lambda job: None}, config=cfg).start()
    try:
        assert w.await_drained(timeout=60)
    finally:
        w.stop()
    assert store.jobs_with_status(STATUS_FINISHED) == ["s-1"]
