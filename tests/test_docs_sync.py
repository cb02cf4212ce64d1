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
