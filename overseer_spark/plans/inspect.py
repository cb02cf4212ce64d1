"""Physical-plan inspection: machine-checkable scale properties.

Every operator in this engine is declared logically and Catalyst plans it;
these helpers make the *physical* consequences assertable in tests
(tests/test_plans.py): predicate pushdown reached the parquet scan, small
dimensions broadcast instead of shuffling, aggregations are partial+final,
top-k plans as TakeOrderedAndProject rather than a full sort. These are the
properties that decide whether a plan survives a 100× scale-up, so they are
pinned by tests, not just eyeballed once.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (``PushedFilters: [...]``)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (``ReadSchema``) — column pruning
    evidence: a 2-column projection must not scan 11 columns."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine: HashAggregate appears in partial + final modes."""
    text = explain_str(df)
    return text.count("HashAggregate") >= 2 or "partial_" in text


def uses_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT should plan as TakeOrderedAndProject (heap per
    partition + merge), never a full global sort."""
    return "TakeOrderedAndProject" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (fewer breaks
    out of generated code)."""
    return len(set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple"))))


def has_cartesian_or_bnlj(df: DataFrame) -> bool:
    """True if the plan contains an O(n·m) join (CartesianProduct /
    BroadcastNestedLoopJoin) — the shapes bucketed/blocked operators
    exist to avoid."""
    text = explain_str(df)
    return "CartesianProduct" in text or "BroadcastNestedLoopJoin" in text


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (excludes broadcast
    exchanges, which move only the small side)."""
    import re as _re

    return len(
        _re.findall(
            r"(?<!Broadcast)Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)",
            explain_str(df, "simple"),
        )
    )
