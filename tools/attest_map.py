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


def last_green_rounds(repo: str) -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        r = int(m.group(1))
        for q, row in json.load(open(f)).items():
            green = row.get("hash_match") or (
                row.get("rows_match") and not row.get("err")
            )
            if green:
                last[q] = max(r, last.get(q, 0))
    return last


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
