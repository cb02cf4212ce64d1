"""transformWithStateInPandas (streaming/stateful_v2.py): typed ValueState
carries per-key totals across micro-batches and checkpoint restarts, and
agrees with the applyInPandasWithState implementation's semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from overseer_spark.streaming.stateful_v2 import (
    RunningTotalsProcessor,
    requires_protobuf,
    running_totals_v2,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_processor_logic_without_engine():
    """The processor's accumulate logic, driven directly (no state server —
    exercisable everywhere, including protobuf-less containers)."""
    import pandas as pd

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema):
            return FakeValueState()

    p = RunningTotalsProcessor()
    p.init(FakeHandle())
    out1 = list(
        p.handleInputRows((1,), iter([pd.DataFrame({"value": [10.0, 5.0]})]), None)
    )
    assert out1[0].iloc[0].tolist() == [1, 2, 15.0]
    out2 = list(p.handleInputRows((1,), iter([pd.DataFrame({"value": [1.0]})]), None))
    # state carried: (2, 15.0) -> (3, 16.0)
    assert out2[0].iloc[0].tolist() == [1, 3, 16.0]


@pytest.mark.skipif(
    not requires_protobuf(),
    reason="transformWithState state protocol needs the protobuf package "
    "(absent in this container); operator gated per stateful_v2.py",
)
def test_running_totals_v2_across_batches(spark, tmp_path):
    src = str(tmp_path / "st2_src")
    ckpt = str(tmp_path / "st2_ckpt")
    os.makedirs(src, exist_ok=True)

    def feed(rows):
        spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        sdf = spark.readStream.schema(SCHEMA).parquet(src)
        out: dict[int, tuple[int, float]] = {}

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                out[r["user_id"]] = (r["n"], r["total"])

        q = (
            running_totals_v2(sdf)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return out

    feed([(1, 10.0), (1, 5.0), (2, 1.0)])
    assert run() == {1: (2, 15.0), 2: (1, 1.0)}

    feed([(1, 1.0), (3, 7.0)])
    second = run()
    # ValueState recovered from the checkpoint: user 1 resumes at (2, 15.0)
    assert second[1] == (3, 16.0)
    assert second[3] == (1, 7.0)
