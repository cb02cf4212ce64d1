"""CLI runner — the reference's ``bin/overseer myapp.jar
myapp.core/job-handlers -c config.yml`` entry point
(overseer/runner: -main / parse-ns / read-config), Spark-flavored:

    python -m overseer_spark --handlers myapp.handlers:HANDLERS \
        [--graph myapp.handlers:GRAPH | --type-graph '{"t2": ["t1"]}'] \
        [--args '{"run": "2026-08-13"}'] \
        [--store memory | --store spark:/path/to/state] \
        [--config config.json] [--once]

``--once`` drains the queue and exits (batch pipelines); without it the
worker loops run until interrupted. Config JSON keys mirror Config fields
(detector_sleep_time, sleep_time, heartbeat.sleep_time, heartbeat.tolerance).
YAML configs load too when pyyaml is importable.
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys
import time
from typing import Any

from overseer_spark.config import Config, HeartbeatConfig


def parse_ref(ref: str) -> Any:
    """``"module.sub:attr"`` → imported attribute (reference ``parse-ns``)."""
    module_name, _, attr = ref.partition(":")
    if not attr:
        raise SystemExit(f"--handlers/--graph must be module:attr, got {ref!r}")
    module = importlib.import_module(module_name)
    try:
        return getattr(module, attr)
    except AttributeError as e:
        raise SystemExit(f"{module_name!r} has no attribute {attr!r}") from e


def read_config(path: str | None) -> Config:
    """JSON (or YAML when available) → Config with reference defaults."""
    if path is None:
        return Config()
    text = open(path).read()
    data: dict[str, Any]
    if path.endswith((".yml", ".yaml")):
        try:
            import yaml  # type: ignore[import-not-found]

            data = yaml.safe_load(text)
        except ImportError as e:
            raise SystemExit("YAML config requires pyyaml; use JSON") from e
    else:
        data = json.loads(text)
    hb = data.pop("heartbeat", {})
    return Config(
        **{k: v for k, v in data.items() if k in Config.__dataclass_fields__},
        heartbeat=HeartbeatConfig(
            **{k: v for k, v in hb.items() if k in HeartbeatConfig.__dataclass_fields__}
        ),
    )


def build_store(spec: str):
    from overseer_spark import api

    if spec == "memory":
        return api.memory_store()
    if spec.startswith("spark:"):
        from overseer_spark.session import get_spark

        return api.spark_store(get_spark("overseer-runner"), spec.split(":", 1)[1])
    if spec.startswith("filecas:"):
        # cross-process CAS on a shared directory: many `python -m
        # overseer_spark --store filecas:/shared/state` workers coordinate
        # with no master, like the reference's worker pool
        from overseer_spark.session import get_spark

        return api.filecas_store(get_spark("overseer-runner"), spec.split(":", 1)[1])
    if spec.startswith("filecas-nospark:"):
        return api.filecas_store(None, spec.split(":", 1)[1])
    if spec.startswith("manifest:"):
        # object-store-safe commit log (conditional writes, no link(2)):
        # the store spec for metadata living on S3/GCS-style storage
        from overseer_spark.session import get_spark

        return api.manifest_store(get_spark("overseer-runner"), spec.split(":", 1)[1])
    if spec.startswith("manifest-nospark:"):
        return api.manifest_store(None, spec.split(":", 1)[1])
    if spec.startswith("sqlite:"):
        # SQL-database deployment leg (reference adapter registry
        # config.clj:49): many worker processes share one database file
        return api.sqlite_store(spec.split(":", 1)[1])
    raise SystemExit(
        f"unknown store spec {spec!r} "
        "(memory | spark:<path> | filecas:<path> | manifest:<path> | sqlite:<path>)"
    )


def main(argv: list[str] | None = None) -> int:
    from overseer_spark import api

    p = argparse.ArgumentParser(prog="overseer_spark")
    p.add_argument("--handlers", required=True, help="module:attr of {type: handler}")
    p.add_argument("--graph", help="module:attr of a JobGraph or type-graph dict")
    p.add_argument("--type-graph", help="inline JSON adjacency map {type: [dep_types]}")
    p.add_argument("--args", help="inline JSON args for job_graph instantiation")
    p.add_argument(
        "--store",
        default="memory",
        help="memory | spark:<path> | filecas:<path> | manifest:<path> | sqlite:<path>",
    )
    p.add_argument("--config", help="JSON/YAML config file")
    p.add_argument("--once", action="store_true", help="drain the queue and exit")
    ns = p.parse_args(argv)

    handlers = parse_ref(ns.handlers)
    config = read_config(ns.config)
    store = build_store(ns.store)

    graph = None
    if ns.graph:
        graph = parse_ref(ns.graph)
    elif ns.type_graph:
        graph = json.loads(ns.type_graph)
    if isinstance(graph, dict):
        graph = api.job_graph(graph, args=json.loads(ns.args) if ns.args else None)
    if graph is not None:
        api.validate_graph_handlers(handlers, graph)
        api.transact_graph(store, graph)

    if ns.once:
        api.run_pipeline(store, handlers, config)
        return 0
    worker = api.start(store, handlers, config)
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        worker.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
