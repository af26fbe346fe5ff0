"""Regenerate tests/pinned_queries.json — the oracle+source pin ledger.

Each pin is sha256(oracle_sql + inspect.getsource(query_fn))[:16] for
every registry entry NOT in attestation.NEW_OR_CHANGED (new/changed
entries get pinned at the start of the NEXT round, after the driver has
attested them).

Regenerating is a CONSCIOUS act: only run this after either
(a) the driver's CORRECTNESS artifact shows the entry green at its new
    source, or
(b) you re-attested it locally via
    `python tools/parity.py /root/testdata/sf0.01 <query>`.

    python tools/pin_hashes.py          # rewrite the ledger
    python tools/pin_hashes.py --check  # print drift, exit 1 if any
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys


def compute_pins() -> dict[str, str]:
    import __spark_entry__ as m
    from udata_datalake_service_spark.attestation import NEW_OR_CHANGED

    qs = m.queries()
    sql = m.oracle_sql()
    return {
        name: hashlib.sha256(
            (sql.get(name, "") + inspect.getsource(qs[name])).encode()
        ).hexdigest()[:16]
        for name in sorted(qs)
        if name not in NEW_OR_CHANGED
    }


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    path = os.path.join(repo, "tests", "pinned_queries.json")
    pins = compute_pins()
    if "--check" in sys.argv:
        old = json.load(open(path)) if os.path.exists(path) else {}
        drift = {k: (old.get(k), v) for k, v in pins.items() if old.get(k) != v}
        for k, (a, b) in sorted(drift.items()):
            print(f"{k}: {a} -> {b}")
        return 1 if drift else 0
    with open(path, "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
    print(f"wrote {len(pins)} pins to {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
