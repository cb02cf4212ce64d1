"""Cluster-tuning calculator: derive the Spark confs for a target data
scale from first principles, instead of guessing round numbers.

The local test matrix runs at sf0.1 (~100 MB); production intent is
~100 TB on a multi-executor cluster. These settings don't transfer by
copying — they follow from a few invariants:

- a shuffle partition should hold 100-200 MB *post-compression* so a
  task neither thrashes GC (too big) nor drowns in scheduling overhead
  (too small);
- input splits (`files.maxPartitionBytes`) should keep every core busy
  for the scan stage but not exceed the shuffle target;
- the broadcast threshold trades driver/executor memory for avoided
  shuffles — it must fit comfortably inside each executor's storage
  fraction;
- AQE's advisory size is the coalescing target; set it equal to the
  shuffle sweet spot and let runtime statistics do the rest.

Usage:
    python tools/tuning_calc.py --tb 100 --executors 1000 \
        --cores 8 --mem-gb 64
prints a JSON conf block plus the arithmetic behind each choice.
`recommended_confs()` is importable and unit-tested
(tests/test_tuning_calc.py).
"""

from __future__ import annotations

import argparse
import json
import math

MB = 1024 * 1024
GB = 1024 * MB
TB = 1024 * GB

TARGET_SHUFFLE_PARTITION_BYTES = 128 * MB  # post-compression sweet spot
MAX_PARTITIONS = 200_000  # scheduler sanity ceiling (task launch overhead)


def recommended_confs(
    data_bytes: int,
    executors: int,
    cores_per_executor: int,
    mem_per_executor_bytes: int,
    shuffle_ratio: float = 0.5,
) -> dict:
    """Conf block + rationale for one (data size, cluster) point.

    ``shuffle_ratio``: fraction of the input that survives projection/
    filtering into the big shuffles (0.5 is conservative for analytic
    plans with column pruning; dedup pipelines that shuffle fingerprints
    only can drop to ~0.05).
    """
    total_cores = executors * cores_per_executor
    shuffle_bytes = int(data_bytes * shuffle_ratio)

    # partitions: size-driven, rounded UP to a multiple of total cores so
    # every wave is full, capped by the scheduler ceiling
    size_driven = max(1, shuffle_bytes // TARGET_SHUFFLE_PARTITION_BYTES)
    waves = max(1, math.ceil(size_driven / total_cores))
    partitions = min(waves * total_cores, MAX_PARTITIONS)

    # input splits: fill the cores on the scan stage; never above 256 MB
    split = min(256 * MB, max(16 * MB, data_bytes // total_cores))

    # broadcast: ≤ 5% of executor memory (unified memory leaves ~60% for
    # execution+storage; a broadcast lives once per executor)
    broadcast = min(512 * MB, int(mem_per_executor_bytes * 0.05))

    # executor-memory-per-task is what bounds a sort/hash spill
    per_task = mem_per_executor_bytes * 0.6 / cores_per_executor

    return {
        "confs": {
            "spark.sql.shuffle.partitions": str(partitions),
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.autoBroadcastJoinThreshold": str(broadcast),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
                TARGET_SHUFFLE_PARTITION_BYTES
            ),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
        },
        "rationale": {
            "total_cores": total_cores,
            "assumed_shuffle_bytes": shuffle_bytes,
            "partition_target_bytes": TARGET_SHUFFLE_PARTITION_BYTES,
            "scan_waves": max(
                1, data_bytes // split // total_cores
            ),
            "shuffle_waves": partitions // total_cores,
            "mem_per_task_bytes": int(per_task),
            "spill_expected": per_task
            < TARGET_SHUFFLE_PARTITION_BYTES * 4,
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tb", type=float, default=100.0)
    ap.add_argument("--executors", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--mem-gb", type=int, default=64)
    ap.add_argument("--shuffle-ratio", type=float, default=0.5)
    ns = ap.parse_args()
    out = recommended_confs(
        int(ns.tb * TB), ns.executors, ns.cores, ns.mem_gb * GB, ns.shuffle_ratio
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
