"""Round-START refresh: regenerate the attestation ledger in place.

VERDICT r12 task 2: round 12 skipped the manual refresh (bump
``CURRENT_ROUND``, re-paste ``LAST_DRIVER_ROUND`` from the new driver
artifact, reset ``NEW_OR_CHANGED``) and the driver re-attested the
identical 50-query window — the rotation froze for a round.  This script
makes the refresh one command, and
``tests/test_entry_contract.py::test_round_was_opened`` makes skipping
it a red test the moment the new round's builder touches any source
file.

    python tools/round_open.py        # refresh + re-pin
    python tools/round_open.py --check  # exit 1 if a refresh is due

Mechanics:
1. New ``CURRENT_ROUND`` = max committed ``CORRECTNESS_r*.json`` round + 1.
2. ``LAST_DRIVER_ROUND`` is regenerated from the committed artifacts
   (same computation as ``tools/attest_map.py``).
3. ``NEW_OR_CHANGED`` is reset to empty (the new round's edits are added
   by hand as they happen).
4. Pins are regenerated for the entries that just left NEW_OR_CHANGED
   (they were driver-attested in the closing round at current code).
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ATTESTATION = os.path.join(REPO, "udata_datalake_service_spark", "attestation.py")


def latest_artifact_round() -> int:
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json artifacts found")
    return max(rounds)


def current_round() -> int:
    src = open(ATTESTATION).read()
    m = re.search(r"^CURRENT_ROUND = (\d+)$", src, re.M)
    assert m, "CURRENT_ROUND literal not found"
    return int(m.group(1))


def refresh_due() -> bool:
    """True when the latest driver artifact belongs to CURRENT_ROUND —
    i.e. the round it closed is over and the ledger paste is pending."""
    return latest_artifact_round() >= current_round()


SOURCE_PREFIXES = (
    "udata_datalake_service_spark/", "tests/", "tools/",
    "__spark_entry__.py", "bench.py",
)


def builder_work_since_artifact(artifact: str, repo: str = REPO) -> list[str]:
    """Source files touched (by commits or the dirty working tree) after
    the commit that introduced ``artifact``.  Non-empty in exactly the
    r12 failure state: the driver's round-N artifact has landed, the
    ledger refresh hasn't run, and a new round's builder has started
    editing.  Returns [] when git is unavailable (advisory-only)."""
    try:
        artifact_commit = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--", artifact],
            cwd=repo, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        if not artifact_commit:
            return []  # artifact not committed yet — still mid-landing
        later = subprocess.run(
            ["git", "log", "--name-only", "--format=", f"{artifact_commit}..HEAD"],
            cwd=repo, capture_output=True, text=True, timeout=30,
        ).stdout.split()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=repo, capture_output=True, text=True, timeout=30,
        ).stdout.splitlines()
        dirty_files = [line[3:].strip() for line in dirty if len(line) > 3]
    except (OSError, subprocess.TimeoutExpired):
        return []
    return sorted(
        {f for f in later + dirty_files if f.startswith(SOURCE_PREFIXES)}
    )


def rewrite_attestation(src: str, new_round: int, ledger_body: str) -> str:
    """Pure-text refresh of attestation.py: bump CURRENT_ROUND, reset
    NEW_OR_CHANGED, replace the LAST_DRIVER_ROUND body.  Each anchor must
    match exactly once — a silent no-op here IS the r12 bug, so missing
    anchors raise instead of returning the input unchanged."""
    out, n = re.subn(
        r"^CURRENT_ROUND = \d+$", f"CURRENT_ROUND = {new_round}", src, flags=re.M
    )
    if n != 1:
        raise ValueError(f"CURRENT_ROUND anchor matched {n} times")
    out, n = re.subn(
        r"(NEW_OR_CHANGED: frozenset\[str\] = frozenset\(\{\n).*?(\}\))",
        rf"\g<1>    # round-{new_round} changes (populated as queries are added/edited this round)\n\g<2>",
        out,
        count=1,
        flags=re.S,
    )
    if n != 1:
        raise ValueError("NEW_OR_CHANGED anchor not found")
    out, n = re.subn(
        r"(LAST_DRIVER_ROUND: dict\[str, int\] = \{\n).*?(^\})",
        lambda m: m.group(1) + ledger_body + m.group(2),
        out,
        count=1,
        flags=re.S | re.M,
    )
    if n != 1:
        raise ValueError("LAST_DRIVER_ROUND anchor not found")
    return out


def main(argv: list[str]) -> int:
    if "--check" in argv:
        if refresh_due():
            print(
                f"round refresh DUE: CORRECTNESS_r{latest_artifact_round():02d} "
                f"landed but CURRENT_ROUND is still {current_round()} — run "
                "python tools/round_open.py"
            )
            return 1
        print(f"ledger current (round {current_round()})")
        return 0

    if not refresh_due():
        print(f"nothing to do: already at round {current_round()}")
        return 0

    new_round = latest_artifact_round() + 1
    sys.path.insert(0, REPO)
    from tools.attest_map import last_green_rounds
    from udata_datalake_service_spark.entry_queries import QUERIES

    last = last_green_rounds(REPO)
    missing = sorted(set(QUERIES) - set(last))
    if missing:
        print(f"warning: never driver-attested (kept out of ledger): {missing}")
    body = "".join(f'    "{q}": {last[q]},\n' for q in sorted(QUERIES) if q in last)

    src = rewrite_attestation(open(ATTESTATION).read(), new_round, body)
    open(ATTESTATION, "w").write(src)
    print(f"attestation.py refreshed: CURRENT_ROUND={new_round}, "
          f"{body.count(chr(10))} ledger entries, NEW_OR_CHANGED reset")

    # entries that just left NEW_OR_CHANGED need their pins regenerated
    rc = subprocess.call([sys.executable, os.path.join(REPO, "tools", "pin_hashes.py")])
    if rc:
        return rc
    print("done — run pytest tests/test_entry_contract.py to confirm green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
