"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for semantics windows can't express: per-key mutable state
carried across micro-batches with timeout-based expiry. Used here for a
running per-key accumulator (count + sum); the same shape implements
sessionization with custom logic, dedup-within-horizon, CEP-ish patterns.

State is partitioned by key across executors and checkpointed — the
streaming analogue of the engine's state-as-tables stance.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id bigint, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def running_totals(
    stream_df: DataFrame, key: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Running (count, sum) per key, updated each micro-batch — custom
    stateful logic that outlives any window."""

    def update(
        key_tuple: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key_tuple[0]], "n": [n], "total": [total]})

    return stream_df.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
