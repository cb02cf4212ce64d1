"""Seeded differential fuzzing: 40 random queries must agree between the
Spark DataFrame build and DuckDB SQL generated from the same AST. Any
failure message carries the seed + SQL for exact reproduction."""

from __future__ import annotations

import pytest

import sys

sys.path.insert(0, "tools")

from fuzz_differential import TABLES, run_case  # noqa: E402
from tests.conftest import SF_CORRECTNESS  # noqa: E402


@pytest.mark.slow
def test_forty_seeded_random_queries_agree(spark, duck):
    import duckdb  # noqa: F401  (duck fixture already registered views)

    failures = []
    for seed in range(40):
        ok, detail = run_case(spark, duck, SF_CORRECTNESS, seed)
        if not ok:
            failures.append(detail)
    assert not failures, "\n".join(failures)


def test_strfunc_family_seeded_queries_agree(spark, duck):
    """Row-level string functions (SUBSTR bounds, REPLACE, STRPOS,
    TRIM-over-concat, REVERSE, LPAD, LIKE wildcards) — the scalar
    string dialect seam at row granularity."""
    failures = []
    for seed in range(2000, 2012):
        ok, detail = run_case(spark, duck, SF_CORRECTNESS, seed,
                              family="strfunc")
        if not ok:
            failures.append(detail)
    assert not failures, "\n".join(failures)


def test_numfunc_family_seeded_queries_agree(spark, duck):
    """Row-level numeric/JSON scalar seams: pmod-of-negative, bitwise
    AND/OR/XOR/shift, TRY_CAST miss→NULL, TRY_DIVIDE with NULLIF'd
    divisor, guarded LN, FLOOR division, JSON path hit/miss."""
    failures = []
    for seed in range(3000, 3012):
        ok, detail = run_case(spark, duck, SF_CORRECTNESS, seed,
                              family="numfunc")
        if not ok:
            failures.append(detail)
    assert not failures, "\n".join(failures)


def test_decagg_family_seeded_queries_agree(spark, duck):
    """Exact DECIMAL grouped aggregation compared as exact strings —
    money math must agree bit-for-bit, no float tolerance."""
    failures = []
    for seed in range(4000, 4012):
        ok, detail = run_case(spark, duck, SF_CORRECTNESS, seed,
                              family="decagg")
        if not ok:
            failures.append(detail)
    assert not failures, "\n".join(failures)


def test_rangewin_family_seeded_queries_agree(spark, duck):
    """RANGE-frame windows: peer-inclusive value frames are deterministic
    even over tied orderings, so this family may fuzz lineitem — the
    table the ROWS-frame family excludes (determinism rule 7)."""
    failures = []
    for seed in range(1000, 1012):
        ok, detail = run_case(spark, duck, SF_CORRECTNESS, seed,
                              family="rangewin")
        if not ok:
            failures.append(detail)
    assert not failures, "\n".join(failures)


def test_datescalar_family_seeded_queries_agree(spark, duck):
    """Row-level datetime scalar seams: date_trunc at four granularities,
    EXTRACT fields (0=Sunday dow convention), day arithmetic, signed
    anchor diffs, LAST_DAY, epoch seconds."""
    failures = []
    for seed in range(5000, 5012):
        ok, detail = run_case(spark, duck, SF_CORRECTNESS, seed,
                              family="datescalar")
        if not ok:
            failures.append(detail)
    assert not failures, "\n".join(failures)


def test_arrayfunc_family_seeded_queries_agree(spark, duck):
    """Array/list scalar seams (18th family, round 7): slices, OOB
    access, absence encoding, HOF folds, order-normalized distinct /
    union, safe-regime sequence, equal-length zips — the surface where
    the round-7 sequence(2,1)-descends divergence lived."""
    failures = []
    for seed in range(6000, 6012):
        ok, detail = run_case(spark, duck, SF_CORRECTNESS, seed,
                              family="arrayfunc")
        if not ok:
            failures.append(detail)
    assert not failures, "\n".join(failures)


def test_bitfunc_family_seeded_queries_agree(spark, duck):
    """Bitwise seams (19th family, round 8 — added with the sign-bit
    binary-quantization entries whose ranking rests on xor/bit_count):
    two's-complement bit_count, arithmetic right shift on negatives,
    sign-of-dividend %, masked and/or/not, safe-regime <<."""
    failures = []
    for seed in range(7000, 7012):
        ok, detail = run_case(spark, duck, SF_CORRECTNESS, seed,
                              family="bitfunc")
        if not ok:
            failures.append(detail)
    assert not failures, "\n".join(failures)
