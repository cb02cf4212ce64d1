"""Structured Streaming: the same window transformations run as a real
stream (file source, availableNow trigger) and agree with their batch
execution; watermark late-data drop is exercised across micro-batches.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from overseer_spark.streaming.windows import session_counts, tumbling_counts

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows, n):
    spark.createDataFrame(rows, schema=EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_stream_batch_parity_tumbling(spark, tmp_path):
    """availableNow streaming run of tumbling_counts == batch run."""
    src = str(tmp_path / "events_src")
    rows = [
        (i, _ts(i % 50), i % 3, "click" if i % 2 else "view", float(i)) for i in range(200)
    ]
    _write_batch(spark, src, rows, 0)

    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(src)
    expected = {
        (str(r["win"]["start"]), r["event_type"]): (r["c"], r["s"])
        for r in tumbling_counts(batch_df, duration="10 minutes").collect()
    }

    stream_df = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    agg = tumbling_counts(stream_df, duration="10 minutes", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["win"]["start"]), r["event_type"]): (r["c"], r["s"])
        for r in spark.sql("SELECT * FROM tumbling_parity").collect()
    }
    assert got == expected


def test_watermark_drops_late_rows_across_microbatches(spark, tmp_path):
    """Two availableNow runs over a shared checkpoint: run 1 advances the
    watermark to 10:30 (max 10:40 − 10 min); run 2 adds a row >watermark
    late (10:05) plus a fresh row. Append mode must finalize the 10:00
    window WITHOUT the late row."""
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")
    os.makedirs(src, exist_ok=True)

    def run():
        stream_df = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        agg = tumbling_counts(stream_df, duration="10 minutes", watermark="10 minutes")
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        counts: dict[str, list[int]] = {}
        for r in rows:
            counts.setdefault(str(r["win"]["start"]), []).append(r["c"])
        return counts

    _write_batch(spark, src, [(1, _ts(0), 1, "a", 1.0), (2, _ts(40), 1, "a", 1.0)], 0)
    first = run()
    # run 1's final commit advanced the watermark to 10:30 and finalized the
    # 10:00 window with only event_id=1
    assert first.get("2024-01-01 10:00:00") == [1]
    _write_batch(spark, src, [(3, _ts(5), 1, "a", 1.0), (4, _ts(41), 1, "a", 1.0)], 1)
    second = run()
    # event_id=3 at 10:05 is behind the recovered watermark (10:30) → dropped.
    # If it were NOT dropped it would re-open the purged 10:00 window and
    # append a second (wrong) row for it.
    assert second.get("2024-01-01 10:00:00") == [1]
    assert all(start >= "2024-01-01 10:30:00" for start in second if start != "2024-01-01 10:00:00")


def test_stream_batch_parity_sessions(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    rows = [
        (1, _ts(0), 1, "a", 1.0),
        (2, _ts(2), 1, "a", 1.0),  # same session (gap 2 < 5)
        (3, _ts(20), 1, "a", 1.0),  # new session
        (4, _ts(1), 2, "a", 1.0),
    ]
    _write_batch(spark, src, rows, 0)
    batch = session_counts(spark.read.schema(EVENT_SCHEMA).parquet(src)).collect()
    sessions_per_user = {}
    for r in batch:
        sessions_per_user[r["user_id"]] = sessions_per_user.get(r["user_id"], 0) + 1
    assert sessions_per_user == {1: 2, 2: 1}

    stream_df = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    agg = session_counts(stream_df, watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_parity").collect()
    got_per_user = {}
    for r in got:
        got_per_user[r["user_id"]] = got_per_user.get(r["user_id"], 0) + 1
    assert got_per_user == sessions_per_user


def test_stream_dedup_within_watermark_across_microbatches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside one micro-batch AND
    across micro-batches (within the watermark horizon) are suppressed;
    every key surfaces exactly once. maxFilesPerTrigger=1 forces the
    cross-batch path through the dedup state store."""
    from overseer_spark.streaming.windows import dedup_within_watermark

    src = str(tmp_path / "dedup_src")
    ckpt = str(tmp_path / "dedup_ckpt")
    out = str(tmp_path / "dedup_out")
    os.makedirs(src, exist_ok=True)

    # file 1: ids 1,2,2 (in-batch dup); file 2: ids 1 (cross-batch dup), 3
    _write_batch(spark, src, [(1, _ts(0), 1, "a", 1.0), (2, _ts(1), 1, "a", 1.0),
                              (2, _ts(1, 30), 1, "a", 1.0)], 0)
    _write_batch(spark, src, [(1, _ts(5), 1, "a", 1.0), (3, _ts(6), 1, "a", 1.0)], 1)

    stream_df = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_within_watermark(stream_df, keys=("event_id",), delay="10 minutes")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3], ids


@pytest.mark.slow
def test_stateful_recovery_after_mid_stream_kill(spark, tmp_path):
    """Kill a checkpointed stateful query MID-stream and restart it: state
    (per-user running count/sum from applyInPandasWithState) must recover
    from the checkpoint, committed files must not be reprocessed, and the
    recovered totals must equal the batch aggregate — exactly-once end to
    end. The sink is an idempotent foreachBatch parquet write (overwrite
    per batch-id path), the production recovery sink shape — the memory
    sink deliberately refuses checkpoint recovery."""
    from overseer_spark.streaming.stateful import running_totals

    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    users = [1, 2, 3, 4, 5]
    n_files = 6
    all_rows = []
    for b in range(n_files - 1):
        rows = [
            (b * 100 + i, _ts(b, i), users[(b + i) % 5], "click", float(b * 10 + i))
            for i in range(10)
        ]
        all_rows += rows
        _write_batch(spark, src, rows, b)
    # final file touches EVERY user so the post-restart emissions carry the
    # complete recovered state for all keys
    final = [(900 + u, _ts(55, u), u, "click", 0.5 * u) for u in users]
    all_rows += final

    def write_batch(df, batch_id):
        # overwrite-by-batch-path: replaying an uncommitted batch after the
        # kill rewrites the same files — idempotent, hence exactly-once
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite").parquet(
            os.path.join(sink, f"b{batch_id:05d}")
        )

    def start(trigger_kwargs):
        sdf = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            running_totals(sdf)
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    # run 1: one file per micro-batch; kill after >=2 batches committed but
    # before all 5 are — a hard stop mid-stream
    q1 = start({"processingTime": "0 seconds"})
    deadline = time.time() + 120
    while time.time() < deadline:
        if sum(p["numInputRows"] > 0 for p in q1.recentProgress) >= 2:
            break
        time.sleep(0.05)
    q1.stop()
    q1.awaitTermination(60)
    rows_run1 = sum(int(p["numInputRows"]) for p in q1.recentProgress)
    assert 0 < rows_run1 < len(all_rows)  # genuinely mid-stream

    # the "restarted worker" sees MORE data than run 1 ever did
    _write_batch(spark, src, final, n_files - 1)

    # run 2: same checkpoint, drain everything remaining
    q2 = start({"availableNow": True})
    assert q2.awaitTermination(300), "recovery run timed out"
    rows_run2 = sum(int(p["numInputRows"]) for p in q2.recentProgress)
    q2.stop()

    # exactly-once input accounting over COMMITTED batches: nothing counted
    # twice, nothing lost
    assert rows_run1 + rows_run2 == len(all_rows)

    # recovered state equals the batch aggregate for every user: take each
    # user's emission from the highest batch_id
    out = spark.read.parquet(os.path.join(sink, "*"))
    w = __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    ).orderBy(F.desc("batch_id"), F.desc("n"))
    got = {
        r["user_id"]: (r["n"], round(r["total"], 2))
        for r in out.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(src)
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 2))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected


def test_store_cdc_stream_matches_batch_and_fsm_trace(spark, tmp_path):
    """streaming/store_cdc.py: the manifest commit log drained as a
    stream equals the batch read row-for-row, and the catalog entry's
    rollup is the exact FSM trace of a 3-stage drive."""
    import uuid

    from overseer_spark.core import Job, JobGraph
    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.store.manifest import ManifestCASStore
    from overseer_spark.streaming.store_cdc import (
        transitions_batch,
        transitions_stream,
    )

    path = str(tmp_path / "store")
    s = ManifestCASStore(None, path)
    s.install()
    s.transact_graph(
        JobGraph(jobs=[Job(id=f"j{i}", type="t") for i in range(4)], edges=[])
    )
    assert s.reserve_job("j0") is not None
    s.finish_job("j0")
    s.heartbeat_job("j1")  # heartbeat-only cas: new_status stays NULL

    name = f"cdc_{uuid.uuid4().hex[:10]}"
    q = (
        transitions_stream(spark, path)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(map(str, r)) for r in spark.sql(f"SELECT * FROM {name}").collect())
    want = sorted(tuple(map(str, r)) for r in transitions_batch(spark, path).collect())
    assert got == want and len(got) == 4 + 3  # 4 inserts + 3 cas events

    rows = [
        (r["op"], r["new_status"], r["n"])
        for r in CATALOG["stream_store_transitions"].fn(spark, "unused").collect()
    ]
    assert rows == [("cas", 1, 3), ("cas", 2, 3), ("insert", 0, 3)]
