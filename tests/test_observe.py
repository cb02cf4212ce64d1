"""Observed-metrics gate (operators/observe.py): metrics ride the action,
no second scan; gate() raises on violations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from overseer_spark.operators.observe import gate, with_quality_metrics


def test_metrics_ride_the_action(spark):
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
        (F.col("id") % 100).cast("double").alias("x"),
    )
    observed, obs = with_quality_metrics(
        df, not_null=["v"], bounds={"x": (0.0, 98.0)}
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == 1000
    assert m["nulls_v"] == 100
    assert m["oob_x"] == 10  # x == 99.0 rows


def test_gate_raises_on_violation(spark):
    df = spark.range(100).select(
        F.when(F.col("id") < 5, None).otherwise(F.col("id")).alias("v")
    )
    observed, obs = with_quality_metrics(df, not_null=["v"])
    observed.write.format("noop").mode("overwrite").save()
    with pytest.raises(ValueError, match="nulls_v"):
        gate(obs)
    # a tolerant gate passes
    observed2, obs2 = with_quality_metrics(df, not_null=["v"], name="q2")
    observed2.write.format("noop").mode("overwrite").save()
    gate(obs2, max_null_frac=0.1)
