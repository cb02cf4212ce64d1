"""Custom stateful streaming via Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (stateful.py): instead of
one opaque state tuple per key, a ``StatefulProcessor`` composes typed
state primitives (ValueState / ListState / MapState) with lifecycle hooks
and timers. Same engine stance as stateful.py — state is key-partitioned
across executors, checkpointed, and bounded by TTL/timers in production.

Both implementations of the running-totals operator are kept: stateful.py
is the broadly-available path, this one the forward path; they must agree
(tests/test_stateful_v2.py asserts parity with the batch aggregate).

Dependency note: the transformWithState Python↔JVM state protocol is
protobuf-based; ``requires_protobuf()`` reports availability so callers
(and the test suite) can fall back to stateful.py where the `protobuf`
package is absent. The operator itself is complete and runs wherever a
standard ``pip install pyspark[connect]``-style environment provides it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = "user_id bigint, n bigint, total double"


def requires_protobuf() -> bool:
    """True iff the runtime can execute transformWithStateInPandas."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum) in a typed ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, total double")

    def handleInputRows(
        self, key, rows: Iterator["pd.DataFrame"], timerValues
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

    def close(self) -> None:  # pragma: no cover - no resources to release
        pass


def running_totals_v2(stream_df: DataFrame, key: str = "user_id") -> DataFrame:
    """Running (count, sum) per key via ``transformWithStateInPandas``.

    Session-wide side effect: transformWithState runs only on the RocksDB
    state store, and Spark has no per-query provider override, so this sets
    ``spark.sql.streaming.stateStore.providerClass`` for the WHOLE session
    — any streaming query started afterwards uses RocksDB state (its
    checkpoint format differs from the HDFS-backed default). The conf is
    only touched while the session is still on the built-in default; an
    explicitly configured provider is respected, and the query will then
    fail fast rather than silently repointing other queries' state backend.
    """
    _ROCKS = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    conf = stream_df.sparkSession.conf
    key_name = "spark.sql.streaming.stateStore.providerClass"
    current = conf.get(key_name, "") or ""
    if current.rsplit(".", 1)[-1] in ("", "HDFSBackedStateStoreProvider"):
        conf.set(key_name, _ROCKS)
    return stream_df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
