"""Change-data-capture over the ManifestCASStore commit log.

The manifest backend (store/manifest.py) already IS a changelog: every
job transition appends one immutable, totally ordered JSON entry. That
makes engine telemetry a plain Structured Streaming file source — no
triggers, no polling logic, no extra infrastructure: point
``readStream`` at ``_log/``, parse entries, explode actions, and every
downstream streaming operator (windows, watermarks, alerts) works on
job-transition events exactly as it does on any other stream.

This is the streaming twin of the reference's monitoring API
(overseer/doc/guide/Monitoring.md:5-7 — poll jobs-with-status): instead
of polling current state, consumers subscribe to the transition feed.

Scale notes: the source lists the log directory per micro-batch (the
same LIST an object store bills the store's own replay for); checkpoint
files are excluded by glob, quarantined entries by the leading dot.
``compact()`` deletes entries already seen by any up-to-date consumer —
a consumer further behind than the retention window misses folded
history exactly like any CDC reader of a compacted log; size retention
to the slowest consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# permissive projection of store/manifest.py's entry wrapper: cas actions
# carry (id, expect, set.{status,heartbeat}); insert_graph carries rows
_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("crc", T.StringType()),
        T.StructField(
            "entry",
            T.StructType(
                [
                    T.StructField("v", T.LongType()),
                    T.StructField("writer", T.StringType()),
                    T.StructField("ts", T.LongType()),
                    T.StructField(
                        "actions",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("op", T.StringType()),
                                    T.StructField("id", T.StringType()),
                                    T.StructField("expect", T.LongType()),
                                    T.StructField(
                                        "set",
                                        T.StructType(
                                            [
                                                T.StructField("status", T.IntegerType()),
                                                T.StructField("heartbeat", T.LongType()),
                                            ]
                                        ),
                                    ),
                                    T.StructField(
                                        "rows",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("id", T.StringType()),
                                                    T.StructField("status", T.IntegerType()),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def _flatten(raw: DataFrame) -> DataFrame:
    """One row per (entry, action, affected job): columns
    (version, writer, ts, op, job_id, new_status). insert_graph explodes
    to one row per inserted job (op = 'insert'); cas rows carry the
    target status when the transition set one (heartbeat-only beats have
    new_status NULL)."""
    e = raw.select(
        F.col("entry.v").alias("version"),
        F.col("entry.writer").alias("writer"),
        F.timestamp_micros(F.col("entry.ts")).alias("ts"),
        F.explode("entry.actions").alias("a"),
    )
    cas = e.where(F.col("a.op") == "cas").select(
        "version",
        "writer",
        "ts",
        F.lit("cas").alias("op"),
        F.col("a.id").alias("job_id"),
        F.col("a.set.status").alias("new_status"),
    )
    ins = (
        e.where(F.col("a.op") == "insert_graph")
        .select("version", "writer", "ts", F.explode("a.rows").alias("r"))
        .select(
            "version",
            "writer",
            "ts",
            F.lit("insert").alias("op"),
            F.col("r.id").alias("job_id"),
            F.col("r.status").alias("new_status"),
        )
    )
    return cas.unionByName(ins)


def transitions_stream(spark: SparkSession, store_path: str) -> DataFrame:
    """Unbounded stream of job-transition events from a manifest store's
    commit log. Drive with any sink/trigger; ``availableNow`` gives the
    batch-parity drain used by the tests and the catalog entry."""
    raw = (
        spark.readStream.schema(_ENTRY_SCHEMA)
        # entry files only: NNN...N.json; excludes NNN.ckpt.json
        .option("pathGlobFilter", "*[0-9].json")
        .json(f"{store_path}/_log")
    )
    return _flatten(raw)


def transitions_batch(spark: SparkSession, store_path: str) -> DataFrame:
    """Batch twin over the same files (parity oracle for the stream)."""
    raw = (
        spark.read.schema(_ENTRY_SCHEMA)
        .option("pathGlobFilter", "*[0-9].json")
        .json(f"{store_path}/_log")
    )
    return _flatten(raw)
