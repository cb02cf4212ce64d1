"""SQL function registry: the engine's column functions for SQL callers.

The Python API exposes functions/{textfns,vectors,maps}.py as Column
expressions. SQL pipelines (spark.sql / the thriftserver / a notebook user)
get the same functions here as **SQL scalar functions** (`CREATE FUNCTION …
RETURN <expr>`, Spark 3.5+/4): the body is substituted into the caller's
plan as an expression, so everything stays inside Catalyst and whole-stage
codegen — unlike `spark.udf.register`, which would drop to a Python
round-trip per row. Registering is idempotent (OR REPLACE, temp scope).

Parity with the Column versions is pytest-pinned (tests/test_registry.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS: dict[str, str] = {
    # normalization applied before hashing/dedup — functions/textfns.py
    "os_norm_text": """(s STRING) RETURNS STRING
        RETURN lower(regexp_replace(trim(s), '\\\\s+', ' '))""",
    # whitespace token count (0 for empty/null-ish strings)
    "os_token_count": """(s STRING) RETURNS INT
        RETURN CASE WHEN s IS NULL OR trim(s) = '' THEN 0
                    ELSE size(split(trim(s), '\\\\s+')) END""",
    # vector functions — functions/vectors.py (float64 accumulation in
    # element order, matching the Column implementations bit-for-bit)
    "os_vec_dot": """(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) ->
                   cast(x AS DOUBLE) * cast(y AS DOUBLE)), 0D, (acc, v) -> acc + v)""",
    "os_l2_norm": """(a ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN sqrt(aggregate(transform(a, x ->
                   cast(x AS DOUBLE) * cast(x AS DOUBLE)), 0D, (acc, v) -> acc + v))""",
    "os_cosine": """(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN os_vec_dot(a, b) / (os_l2_norm(a) * os_l2_norm(b))""",
    # content fingerprint used by exact dedup
    "os_fingerprint": """(s STRING) RETURNS STRING
        RETURN md5(lower(regexp_replace(trim(s), '\\\\s+', ' ')))""",
}


def register_all(spark: SparkSession) -> list[str]:
    """Create all engine SQL functions (temporary, session-scoped)."""
    for name, body in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return sorted(_FUNCTIONS)
