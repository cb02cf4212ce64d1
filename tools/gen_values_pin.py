"""Regenerate a PY-provenance VALUES pin for a catalog entry.

Some approximate-path entries (the IVF/IVF-PQ family) are deterministic
pure functions of their inputs but not DuckDB-expressible; their oracles
are the plan's own layout-swept output as a SQL VALUES literal (the
"measured pin" convention documented on each entry). When the plan
changes deliberately (e.g. the round-9 trained coarse quantizer), re-pin
mechanically:

    python tools/gen_values_pin.py ann_ivf_topk ann_ivfpq_topk

prints one `SELECT * FROM (VALUES ...) AS t(cols) ORDER BY ...` per
entry, built from the entry's own sf0.01 output. ALWAYS verify layout
stability before committing a new pin: run the entry under ≥3 partition
layouts (local[5]/shuffle 7 AQE on, local[8]/8 AQE off, local[32]/32
AQE on) and diff the collected rows — the pin is only valid if they are
bit-identical. The full sweep contract, oracle tiers, and scale-ladder
requirements live in docs/VERIFY.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def sql_literal(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def values_pin(rows, cols: list[str], order_by: str) -> str:
    tuples = ", ".join(
        "(" + ", ".join(sql_literal(v) for v in row) + ")" for row in rows
    )
    return (
        f"SELECT * FROM (VALUES {tuples}) AS t({', '.join(cols)}) "
        f"ORDER BY {order_by}"
    )


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.session import get_spark

    spark = get_spark("gen-values-pin")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = CATALOG[name].fn(spark, SF_DIR)
        cols = df.columns
        rows = df.collect()
        # the entry's own trailing orderBy defines row order; default to
        # all columns if the caller wants to override, edit by hand
        print(f"-- {name} ({len(rows)} rows @ {SF_DIR})")
        print(values_pin(rows, cols, ", ".join(cols[:1] + cols[-1:])))
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
