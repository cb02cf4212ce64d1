"""StreamingQueryListener progress capture (streaming/monitor.py)."""

from __future__ import annotations

import time

from overseer_spark.streaming.monitor import attach, detach


def test_progress_monitor_captures_batches(spark, tmp_path):
    mon = attach(spark)
    try:
        src = str(tmp_path / "mon_src")
        spark.range(0, 500, 1, 4).write.mode("overwrite").parquet(src)
        sdf = spark.readStream.schema("id long").parquet(src)
        q = (
            sdf.groupBy().count()
            .writeStream.format("memory")
            .queryName(f"mon_{tmp_path.name}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        # listener delivery is async — allow it to drain
        deadline = time.time() + 30
        while time.time() < deadline and mon.totals()["input_rows"] < 500:
            time.sleep(0.5)
        t = mon.totals()
        assert t["batches"] >= 1
        assert t["input_rows"] == 500
        rows = mon.progress()
        assert all("duration_ms" in r and r["query_id"] for r in rows)
        assert mon.to_json_lines().count("\n") == len(rows) - 1
    finally:
        detach(spark, mon)
