"""Text column functions (tokenization, shingling, character n-grams).

JVM-side only: ``split`` + higher-order functions. Used by the dedup and
text-analysis operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str, sep: str = " ") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, sep)


def shingles(toks: Column, k: int = 3, distinct: bool = True) -> Column:
    """Word k-gram shingles as strings, e.g. ``"a b c"``.

    Empty array (not null) when the document has fewer than ``k`` tokens.
    Built with ``transform`` over an index ``sequence`` so it stays inside
    codegen. NB: ``sequence(1, 0)`` in Spark counts *down*, so the short-doc
    case must be guarded explicitly.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))  # 1-based start positions
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )
    out = F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(out) if distinct else out


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-grams of a string (distinct), JVM-side."""
    text = F.col(text) if isinstance(text, str) else text
    length = F.length(text)
    idx = F.sequence(F.lit(1), length - (n - 1))
    grams = F.transform(idx, lambda i: text.substr(i, F.lit(n)))
    out = F.when(length >= n, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(out)
