"""Singleton-cluster seam of embedding_cluster_medoids: the fixture's min
cluster size (44 at sf0.01) never exercises a 1-member cluster, but a
resampled fixture could — the pre-fix INNER-join oracle dropped singletons
while the Spark side's (s,s) block task kept them with d2_sum=0. Both
sides must now keep the singleton (its only member IS the medoid)."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from overseer_spark.queries.catalog import CATALOG

NAME = "embedding_cluster_medoids"


@pytest.fixture(scope="module")
def singleton_dir(spark):
    d = tempfile.mkdtemp(prefix="medoid_singleton_")
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.5, 0.5], 0),
            (4, [0.0, 2.0], 1),  # singleton cluster
        ],
        "vec_id long, embedding array<float>, label int",
    )
    emb.write.parquet(f"{d}/embeddings.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_singleton_cluster_kept_and_oracle_matched(spark, singleton_dir):
    spec = CATALOG[NAME]
    got = sorted(tuple(r) for r in spec.fn(spark, singleton_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{singleton_dir}/embeddings.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want
    clusters = {r[0] for r in got}
    assert clusters == {0, 1}, "singleton cluster must appear in the output"
    singleton = next(r for r in got if r[0] == 1)
    assert singleton[1] == 4 and singleton[2] == 0
