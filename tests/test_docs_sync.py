"""Docs/catalog drift guards: the generated CATALOG.md and bench.py's
HEADLINE list must stay in sync with the query catalog."""

from __future__ import annotations

import pathlib

from overseer_spark.queries.catalog import CATALOG

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_catalog_md_lists_every_entry():
    md = (ROOT / "CATALOG.md").read_text()
    missing = [name for name in CATALOG if f"`{name}`" not in md]
    assert not missing, f"regenerate CATALOG.md (tools/gen_catalog_md.py): {missing}"


def test_bench_headline_names_exist():
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    unknown = [n for n in bench.HEADLINE if n not in CATALOG]
    assert not unknown, f"bench.py HEADLINE references unknown entries: {unknown}"


def test_entry_count_header_current():
    md = (ROOT / "CATALOG.md").read_text()
    assert f"{len(CATALOG)} entries" in md.splitlines()[2], (
        "CATALOG.md header count stale — regenerate"
    )


def test_priority_list_names_exist_and_unique():
    """__spark_entry__._PRIORITY drives which entries the driver checks
    first — a typo'd name silently drops out of the checked prefix, so
    every name must exist in CATALOG and appear exactly once."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", ROOT / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    unknown = [n for n in mod._PRIORITY if n not in CATALOG]
    assert not unknown, f"_PRIORITY references unknown entries: {unknown}"
    assert len(mod._PRIORITY) == len(set(mod._PRIORITY)), "duplicate priority names"
    # and the full ordering covers the whole catalog exactly once
    names = mod._ordered_names()
    assert sorted(names) == sorted(CATALOG)
