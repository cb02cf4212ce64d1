"""Vector column functions over ``array<float>`` embeddings.

Everything here is built from Spark higher-order functions (``transform`` /
``zip_with`` / ``aggregate``) so the arithmetic runs JVM-side inside
whole-stage codegen — no Python round-trip. Accumulation is float64 in list
order, which makes results bit-deterministic and matchable against a
sequential oracle (FIXTURES.md §D).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product, accumulated in float64 in element order."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return vec_dot(a, b) / (l2_norm(a) * l2_norm(b))
