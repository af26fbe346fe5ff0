"""Regenerate attestation.LAST_DRIVER_ROUND from CORRECTNESS_r*.json.

Run at the start of each round, after the driver's artifact for the
previous round has landed:

    python tools/attest_map.py

Prints the updated dict body; paste it into
udata_datalake_service_spark/attestation.py (and bump CURRENT_ROUND /
reset NEW_OR_CHANGED for the new round).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def last_green_rounds(repo: str, before: int | None = None) -> dict[str, int]:
    """Last green round per query; ``before`` bounds to rounds < before
    (used to compute the pre-paste state for ledger_diff's carve-out)."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        r = int(m.group(1))
        if before is not None and r >= before:
            continue
        for q, row in json.load(open(f)).items():
            green = row.get("hash_match") or (
                row.get("rows_match") and not row.get("err")
            )
            if green:
                last[q] = max(r, last.get(q, 0))
    return last


def ledger_diff(
    ledger: dict[str, int],
    recomputed: dict[str, int],
    names: set[str],
    current_round: int,
    prev_green: dict[str, int] | None = None,
) -> dict[str, tuple[int | None, int | None]]:
    """Entries where the pasted ledger disagrees with the artifacts.

    Round-9 structural fix (VERDICT r8 #1, recurring since r7): the
    driver writes ``CORRECTNESS_r{CURRENT_ROUND}.json`` at the END of the
    round, after the ledger was pasted at round START — so a recomputed
    round EQUAL to ``current_round`` is *expected-newer*, not a mismatch.
    Tightened per ADVICE r9: the carve-out forgives ONLY the single
    end-of-round bump — when ``prev_green`` (last green round strictly
    before ``current_round``, from ``last_green_rounds(repo,
    before=current_round)``) is supplied, the ledger must hold exactly
    that pre-paste value (or be absent for a first-ever attestation);
    any other stale value is a mismatch. Exact equality stays required
    for every round < current_round, and a ledger value AHEAD of the
    artifacts is always a mismatch, so the anti-inflation property is
    preserved.
    """
    diff: dict[str, tuple[int | None, int | None]] = {}
    for k in (set(ledger) | set(recomputed)) & names:
        led, rec = ledger.get(k), recomputed.get(k)
        if led == rec:
            continue
        if rec == current_round:
            # driver's end-of-round artifact postdates the paste
            if prev_green is not None:
                if led == prev_green.get(k):
                    continue  # exactly the one expected bump
            elif led is None or led < current_round:
                continue  # legacy lenient mode (no pre-paste state given)
        diff[k] = (led, rec)
    return diff


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from udata_datalake_service_spark.entry_queries import QUERIES

    last = last_green_rounds(repo)
    for q in sorted(QUERIES):
        if q in last:
            print(f'    "{q}": {last[q]},')
        else:
            print(f"    # {q}: never driver-attested yet", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
