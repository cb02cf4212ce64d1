"""Public facade — the reference's api namespace surface
(overseer/api.clj), Spark-flavored.

    from overseer_spark import api

    store = api.memory_store()                # or api.spark_store(spark, path)
    graph = api.job_graph({"extract": [], "transform": ["extract"],
                           "load": ["transform"]}, args={"run": "2026-08-13"})
    api.validate_graph_handlers(HANDLERS, graph)
    api.transact_graph(store, graph)
    api.run_pipeline(store, HANDLERS)         # single-process drain
    # or: worker = api.start(store, HANDLERS) ... worker.stop()
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import SparkSession

from overseer_spark.config import Config
from overseer_spark.core import (
    JobGraph,
    job_graph,
    missing_handlers,
    simple_graph,
    validate_graph_handlers,
)
from overseer_spark.errors import Abort, AbortSilent, Fault
from overseer_spark.executor import Executor
from overseer_spark.harness import Handler, harness
from overseer_spark.store.base import Store
from overseer_spark.store.memory import MemoryStore
from overseer_spark.store.sparklog import SparkLogStore
from overseer_spark.worker import Worker

__all__ = [
    "Config",
    "Abort",
    "AbortSilent",
    "Fault",
    "abort",
    "abort_silent",
    "fault",
    "harness",
    "job_graph",
    "simple_graph",
    "memory_store",
    "spark_store",
    "filecas_store",
    "manifest_store",
    "sqlite_store",
    "missing_handlers",
    "validate_graph_handlers",
    "transact_graph",
    "run_pipeline",
    "start",
]


def memory_store() -> MemoryStore:
    store = MemoryStore()
    store.install()
    return store


def spark_store(spark: SparkSession, path: str) -> SparkLogStore:
    store = SparkLogStore(spark, path)
    store.install()
    return store


def filecas_store(spark: SparkSession | None, path: str):
    """Cross-process CAS store (store/filecas.py): safe for a masterless
    pool of worker OS processes sharing one state directory — the
    reference's deployment model (doc/guide/Concepts.md:13-16)."""
    from overseer_spark.store.filecas import FileCASStore

    store = FileCASStore(spark, path)
    store.install()
    return store


def manifest_store(spark: SparkSession | None, path: str):
    """Object-store-safe CAS store (store/manifest.py): optimistic commit
    log over a conditional-write primitive (S3 ``If-None-Match: *`` /
    GCS ``ifGenerationMatch=0``), for deployments whose job metadata
    lives on an object store where ``link(2)`` does not exist."""
    from overseer_spark.store.manifest import ManifestCASStore

    store = ManifestCASStore(spark, path)
    store.install()
    return store


def sqlite_store(path: str):
    """SQL-database store (store/sqlite.py): the reference's deployable
    JDBC backend family (config.clj:49 ``#{:mysql :h2 :sqlite}``) via
    Python's stdlib sqlite3 — same DDL, same ``lock_version`` optimistic
    CAS (store/jdbc.clj:62-87)."""
    from overseer_spark.store.sqlite import SqliteStore

    store = SqliteStore(path)
    store.install()
    return store


def transact_graph(store: Store, graph: JobGraph) -> JobGraph:
    """Idempotent atomic graph submission (api.clj:93-97)."""
    return store.transact_graph(graph)


def run_pipeline(
    store: Store, handlers: Mapping[str, Handler], config: Config | None = None
) -> None:
    """Drain the queue in-process (tests / notebooks / one-shot runs)."""
    cfg = config or Config()
    Executor(
        store, handlers, cfg.sleep_time, cfg.rand_seed, cfg.error_sink
    ).run_until_complete()


def start(
    store: Store, handlers: dict[str, Handler], config: Config | None = None
) -> Worker:
    """Start a worker (detector/executor/heartbeat/monitor loops) —
    api.clj:44-48 → worker.clj:24-50."""
    return Worker(store, handlers, config).start()


def start_streaming(
    spark: SparkSession,
    store: Store,
    handlers: dict[str, Handler],
    config: Config | None = None,
    **kwargs: Any,
):
    """Start the scheduler as a Structured Streaming query (the Spark-native
    deployment shape; see streaming/scheduler.py)."""
    from overseer_spark.streaming.scheduler import StreamingWorker

    return StreamingWorker(spark, store, handlers, config, **kwargs).start()


# Control-flow helpers a handler calls mid-flight (api.clj:99-118)

def abort(message: str, data: dict[str, Any] | None = None) -> None:
    raise Abort(message, data)


def abort_silent(message: str = "", data: dict[str, Any] | None = None) -> None:
    raise AbortSilent(message, data)


def fault(message: str, data: dict[str, Any] | None = None) -> None:
    raise Fault(message, data)
