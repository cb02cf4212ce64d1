"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries()`` exposes every
implemented operator from SURVEY.md §2.B (plus the LLM-pipeline extras);
``oracle_sql()`` provides the DuckDB-equivalent SQL for SQL-tier entries.

Ordering: the driver's correctness gate samples a prefix of ``queries()``,
so entries are ordered by verification priority.  The ordering is
*self-rotating*: at import time we read every committed
``CORRECTNESS_r*.json`` in the repo root and front the SQL-tier entries the
driver has never hash-checked, so each round's 50-entry prefix covers 50
previously-unverified entries until the whole catalog carries independent
driver signal.  PY-tier entries (no DuckDB oracle exists by design) and
already-green entries sort last.  The local suite
(tests/test_oracle_parity.py) still checks all entries every run.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from overseer_spark.queries.catalog import CATALOG, flagship

_REPO = os.path.dirname(os.path.abspath(__file__))


def _driver_checked() -> set[str]:
    """Entry names already covered by any prior round's driver gate."""
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                seen.update(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return seen


def _ordered_names() -> list[str]:
    checked = _driver_checked()
    sql_new = [n for n in CATALOG if CATALOG[n].oracle and n not in checked]
    py_new = [n for n in CATALOG if not CATALOG[n].oracle and n not in checked]
    done = [n for n in CATALOG if n in checked]
    return sql_new + py_new + done


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: CATALOG[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: CATALOG[name].oracle
        for name in _ordered_names()
        if CATALOG[name].oracle is not None
    }
