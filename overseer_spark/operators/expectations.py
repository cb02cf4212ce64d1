"""Declarative data-quality expectations over DataFrames.

The data-level extension of the engine's schema validation (core.py R23 —
reference parity: /root/reference/src/overseer/core.clj job-graph
validation checks SHAPE; this checks CONTENT): declare rules, get one
violation-count row per rule. The report is what CI/ingest gates consume
— `assert all counts == 0` — and what dashboards trend.

Execution shape at scale: all row-local rules (not_null / in_range /
matches / in_set) fold into ONE aggregate pass over the table —
conditional sums, no shuffle beyond the final single-row agg. `unique`
adds one groupBy on the checked key; `ref_integrity` one anti-join
(broadcast when the referenced key set is dimension-sized). Rules never
touch rows twice.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # not_null | in_range | matches | in_set | unique | ref_integrity
    col: str
    params: dict = field(default_factory=dict)


def not_null(name: str, col: str) -> Rule:
    return Rule(name, "not_null", col)


def in_range(name: str, col: str, lo, hi) -> Rule:
    return Rule(name, "in_range", col, {"lo": lo, "hi": hi})


def matches(name: str, col: str, pattern: str) -> Rule:
    return Rule(name, "matches", col, {"pattern": pattern})


def in_set(name: str, col: str, values: list) -> Rule:
    return Rule(name, "in_set", col, {"values": tuple(values)})


def unique(name: str, col: str) -> Rule:
    return Rule(name, "unique", col)


def ref_integrity(name: str, col: str, ref_df: DataFrame, ref_col: str) -> Rule:
    return Rule(name, "ref_integrity", col, {"ref_df": ref_df, "ref_col": ref_col})


def _violation_expr(rule: Rule) -> Column:
    c = F.col(rule.col)
    if rule.kind == "not_null":
        bad = c.isNull()
    elif rule.kind == "in_range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        bad = c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    elif rule.kind == "matches":
        bad = c.isNull() | ~c.rlike(rule.params["pattern"])
    elif rule.kind == "in_set":
        bad = c.isNull() | ~c.isin(*rule.params["values"])
    else:  # pragma: no cover - guarded by check()
        raise ValueError(f"not a row-local rule: {rule.kind}")
    return F.sum(bad.cast("long")).alias(rule.name)


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run all rules; returns (rule, violations) sorted by rule name."""
    row_local = [r for r in rules if r.kind in ("not_null", "in_range", "matches", "in_set")]
    results: list[DataFrame] = []
    if row_local:
        agg = df.agg(*[_violation_expr(r) for r in row_local])
        stack = ", ".join(f"'{r.name}', {r.name}" for r in row_local)
        results.append(
            agg.selectExpr(
                f"stack({len(row_local)}, {stack}) as (rule, violations)"
            )
        )
    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(r.col)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                    .cast("long")
                    .alias("violations")
                )
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            results.append(dup)
        elif r.kind == "ref_integrity":
            ref = r.params["ref_df"].select(
                F.col(r.params["ref_col"]).alias(r.col)
            ).distinct()
            orphans = (
                df.join(ref, r.col, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            results.append(orphans)
    out = results[0]
    for other in results[1:]:
        out = out.unionByName(other)
    return out.withColumn("violations", F.col("violations").cast("long")).orderBy(
        "rule"
    )
