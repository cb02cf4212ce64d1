"""Per-round verification checklist — one command for the gate sequence.

The round workflow this repo converged on (rounds 6-7):

START of a round (after the driver committed CORRECTNESS_r{N-1}.json):
    python tools/round_checklist.py --refresh-pins
  Refreshing the pins files here — and ONLY here — is safe: the driver
  rotation (__spark_entry__._round_start_roster) reads
  tests/collect_audit_pins.json as the round-start catalog snapshot, so
  a mid-round refresh would let entries added this round displace
  longer-waiting unchecked entries from the driver's checked prefix.

DURING the round (after adding/reworking entries):
  the pytest gates cover new entries automatically (scan-audit and
  collect-audit both live-audit anything missing from the pins).

END of a round (before the driver snapshot):
    python tools/round_checklist.py
  Runs the two full audit sweeps and the full plain-session oracle
  parity sweep, printing a single PASS/FAIL line per stage.

This wraps tools the round already uses (scan_audit, collect_audit,
the __spark_entry__ parity harness) — it adds no new checking logic,
only the sequencing and the refresh-timing guard.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PINS = [
    os.path.join(REPO, "tests", "collect_audit_pins.json"),
    os.path.join(REPO, "tests", "scan_audit_pins.json"),
]


def refresh_pins() -> None:
    from overseer_spark.queries.catalog import CATALOG

    rounds = sorted(
        f for f in os.listdir(REPO) if f.startswith("CORRECTNESS_r")
    )
    if not rounds:
        print("WARNING: no CORRECTNESS_r*.json found — refreshing anyway")
    else:
        print(f"latest driver snapshot: {rounds[-1]}")
    payload = json.dumps(sorted(CATALOG), indent=0) + "\n"
    for path in PINS:
        with open(path, "w") as f:
            f.write(payload)
        print(f"refreshed {os.path.relpath(path, REPO)} ({len(CATALOG)} names)")


def run_stage(name: str, argv: list[str], env: dict[str, str] | None = None) -> bool:
    print(f"== {name} ==", flush=True)
    rc = subprocess.call(argv, cwd=REPO, env=env)
    print(f"== {name}: {'PASS' if rc == 0 else f'FAIL rc={rc}'} ==", flush=True)
    return rc == 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--refresh-pins",
        action="store_true",
        help="round-START action: snapshot the catalog into the pins files",
    )
    ap.add_argument(
        "--skip-parity",
        action="store_true",
        help="skip the full oracle-parity pytest sweep (the slow stage)",
    )
    ns = ap.parse_args()

    if ns.refresh_pins:
        refresh_pins()
        return

    env = dict(os.environ, PYTHONPATH=REPO)
    ok = True
    ok &= run_stage(
        "scan audit (full catalog)",
        [sys.executable, os.path.join(REPO, "tools", "scan_audit.py")],
        env=env,
    )
    ok &= run_stage(
        "collect audit (full catalog)",
        [sys.executable, os.path.join(REPO, "tools", "collect_audit.py")],
        env=env,
    )
    if not ns.skip_parity:
        ok &= run_stage(
            "oracle parity (full suite file)",
            [
                sys.executable,
                "-m",
                "pytest",
                "tests/test_oracle_parity.py",
                "-q",
            ],
            env=env,
        )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
