"""SQL function registry (functions/registry.py): SQL-callable versions
match the Column implementations exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from overseer_spark.functions.registry import register_all
from overseer_spark.functions.vectors import cosine_similarity, l2_norm, vec_dot


def test_register_and_call(spark):
    names = register_all(spark)
    assert "os_cosine" in names
    row = spark.sql(
        """SELECT os_norm_text('  Hello   WORLD  ') AS t,
                  os_token_count('a b  c') AS n,
                  os_token_count('') AS n0,
                  os_fingerprint(' X  y ') = os_fingerprint('x Y') AS same"""
    ).collect()[0]
    assert row.t == "hello world"
    assert row.n == 3 and row.n0 == 0
    assert row.same is True


def test_vector_functions_match_column_versions(spark):
    register_all(spark)
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])],
        "a array<float>, b array<float>",
    )
    df.createOrReplaceTempView("vecs")
    sql_row = spark.sql(
        """SELECT os_vec_dot(a, b) AS d, os_l2_norm(a) AS na,
                  os_cosine(a, b) AS c FROM vecs"""
    ).collect()[0]
    col_row = df.select(
        vec_dot("a", "b").alias("d"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("c"),
    ).collect()[0]
    assert sql_row.d == col_row.d
    assert sql_row.na == col_row.na
    assert sql_row.c == col_row.c


def test_sql_functions_stay_codegen(spark):
    """The registered functions are expression-substituted (no BatchEvalPython
    in the plan — the reason they beat spark.udf.register)."""
    register_all(spark)
    df = spark.createDataFrame([("a b c",)], "s string")
    df.createOrReplaceTempView("t_reg")
    plan = (
        spark.sql("SELECT os_token_count(s) AS n FROM t_reg")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
