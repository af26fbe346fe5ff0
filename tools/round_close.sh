#!/usr/bin/env bash
# Round-close checklist — run AFTER the final registry edit of the round
# (VERDICT r7 task 1b + r8 task 7: two rounds' red tests shipped in
# snapshot commits that the checklist never re-tested; this script is the
# guard rail, and the FULL pytest suite is its LAST gate so nothing the
# regeneration steps touch can ship untested).
#
#   bash tools/round_close.sh            # full close-out (~30 min)
#   bash tools/round_close.sh --fast     # skip scale probe + bench
#
# Steps, in order (each aborts the script on failure):
#   1. pin ledger is clean for everything not NEW_OR_CHANGED
#   2. full oracle parity at sf0.01 (the driver's gate, locally)
#   3. PLANS.md regenerated to the frozen registry (one row per query)
#   4. SCALE.md regenerated on an idle machine (skipped with --fast)
#   5. bench.py recorded to BENCH_LOCAL_r{N}.json (skipped with --fast)
#   6. FULL pytest suite — LAST, after every artifact regeneration, with
#      the moto object-store leg on by default (opt out only via
#      SPARK_HYDRA_S3_TESTS=0) and the attestation-ledger test included
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND=$(python -c "from udata_datalake_service_spark.attestation import CURRENT_ROUND; print(CURRENT_ROUND)")
echo "== round_close: round ${ROUND} =="

echo "== 1/6 pin check =="
python tools/pin_hashes.py --check

echo "== 2/6 full oracle parity (sf0.01) =="
python tools/parity.py /root/testdata/sf0.01

echo "== 3/6 PLANS.md =="
python tools/plan_audit.py

if [[ "${1:-}" != "--fast" ]]; then
  echo "== 4/6 SCALE.md (idle-machine probe) =="
  python tools/scale_probe.py
  echo "== 5/6 bench (self-writes BENCH_LOCAL_r*.json) =="
  python bench.py | tail -1
else
  echo "== 4-5/6 skipped (--fast) =="
fi

echo "== 6/6 FULL pytest (final gate) =="
python -m pytest tests/ -q

echo "== round_close: ALL GREEN — commit the regenerated artifacts =="
