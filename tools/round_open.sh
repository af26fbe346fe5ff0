#!/usr/bin/env bash
# Round-start guard (VERDICT r12 task 2): regenerate the attestation
# ledger from the freshly-landed driver artifact, re-pin, and prove the
# contract suite green — run this BEFORE touching any source file in a
# new round.
set -euo pipefail
cd "$(dirname "$0")/.."
python tools/round_open.py
python -m pytest tests/test_entry_contract.py -q
