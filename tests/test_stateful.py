"""applyInPandasWithState: per-key state accumulates across micro-batches
(two availableNow runs over a shared checkpoint)."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from overseer_spark.streaming.stateful import running_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "st_src")
    ckpt = str(tmp_path / "st_ckpt")
    os.makedirs(src, exist_ok=True)

    def feed(rows):
        spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run(qname):
        sdf = spark.readStream.schema(SCHEMA).parquet(src)
        out: dict[int, tuple[int, float]] = {}

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                out[r["user_id"]] = (r["n"], r["total"])

        q = (
            running_totals(sdf)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return out

    feed([(1, 10.0), (1, 5.0), (2, 1.0)])
    first = run("running1")
    assert first == {1: (2, 15.0), 2: (1, 1.0)}

    feed([(1, 1.0), (3, 7.0)])
    second = run("running2")
    # state recovered from the checkpoint: user 1 continues from (2, 15.0)
    assert second[1] == (3, 16.0)
    assert second[3] == (1, 7.0)
