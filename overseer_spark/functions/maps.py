"""Map-column functions (R18: schemaless payload handling).

The reference round-trips EDN payload maps and strips non-serializable
entries before shipping them (reference errors.clj:20-34, jdbc.clj:33-43).
Column-side, the engine speaks JSON: parse payloads to ``map<string,string>``,
filter entries, and canonicalize for comparison — all JVM built-ins
(from_json / map_filter / map_entries + HOFs), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_to_map(col: Column | str) -> Column:
    """Parse a JSON-object string column into map<string,string>
    (schema-on-read for the args/props payload pattern)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.from_json(col, "map<string,string>")


def filter_entries(m: Column, pred) -> Column:
    """map_filter with a (key, value) predicate — the column-level analogue
    of the reference's serializable-entry filter."""
    return F.map_filter(m, pred)


def map_to_sorted_string(m: Column, pair_sep: str = "=", entry_sep: str = ",") -> Column:
    """Canonical, deterministic string form of a map (entries sorted by
    key) — maps have no defined order, so any cross-engine comparison or
    grouping key must go through a canonicalization like this."""
    entries = F.transform(
        F.array_sort(F.map_entries(m)),
        lambda e: F.concat(e["key"], F.lit(pair_sep), e["value"]),
    )
    return F.array_join(entries, entry_sep)
