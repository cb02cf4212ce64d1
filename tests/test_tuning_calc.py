"""Unit tests for the cluster-tuning calculator: the arithmetic behind
the 100 TB conf block must satisfy its own invariants at any scale."""

from __future__ import annotations

import sys

sys.path.insert(0, "tools")

from tuning_calc import GB, MB, TB, recommended_confs


def test_100tb_1000_executors_reference_point():
    out = recommended_confs(100 * TB, 1000, 8, 64 * GB)
    confs = out["confs"]
    parts = int(confs["spark.sql.shuffle.partitions"])
    # partitions: full multiples of the 8000 cores, sized near 128 MB
    assert parts % 8000 == 0
    assert parts <= 200_000
    per_part = out["rationale"]["assumed_shuffle_bytes"] / parts
    assert 64 * MB < per_part < 512 * MB
    # broadcast threshold fits in 5% of executor memory
    assert int(confs["spark.sql.autoBroadcastJoinThreshold"]) <= 0.05 * 64 * GB
    assert confs["spark.sql.adaptive.enabled"] == "true"


def test_small_cluster_does_not_degenerate():
    out = recommended_confs(1 * TB, 10, 4, 16 * GB)
    parts = int(out["confs"]["spark.sql.shuffle.partitions"])
    assert parts >= 40  # at least one full wave
    split = int(out["confs"]["spark.sql.files.maxPartitionBytes"])
    assert 16 * MB <= split <= 256 * MB


def test_partition_count_monotone_in_data_size():
    small = int(
        recommended_confs(1 * TB, 100, 8, 64 * GB)["confs"][
            "spark.sql.shuffle.partitions"
        ]
    )
    big = int(
        recommended_confs(100 * TB, 100, 8, 64 * GB)["confs"][
            "spark.sql.shuffle.partitions"
        ]
    )
    assert big >= small


def test_scheduler_ceiling_respected():
    out = recommended_confs(1000 * TB, 2000, 16, 128 * GB)
    assert int(out["confs"]["spark.sql.shuffle.partitions"]) <= 200_000
