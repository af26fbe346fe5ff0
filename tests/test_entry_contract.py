"""Driver-contract sanity: entry() runs, queries/oracles keys line up."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_contract_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # every query has an oracle (the approximate ANN paths are
    # deterministic, so their oracles replay the same math in SQL)
    assert set(qs) == set(oracles)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "avg_qty", "avg_disc", "count_order",
    }


def test_rotation_invariants():
    """Round-6 structural fix (VERDICT r5 #2): the registry order is the
    attestation rotation, not a hand-curated list. Invariants:

    1. insertion order == attestation.rotation_order (the driver reads
       insertion order, so this IS the window assignment);
    2. every NEW_OR_CHANGED entry that exists sits inside the 50-slot
       window (new/changed code always gets a driver row this round);
    3. no entry past the window is staler than the rotation period —
       DERIVED from the registry size (r7 task 8): with N queries and 50
       slots everything re-attests every ceil(N/50) rounds, so the bound
       is CURRENT_ROUND - (ceil(N/50) - 1). At 120 queries that is
       CURRENT_ROUND - 2; growth past 150 queries stretches the period to
       4 rounds and the bound moves WITH it — but see invariant 3b, which
       fails loudly when the period itself grows, forcing either window
       widening or query retirement instead of silently longer staleness;
    4. every entry is either in the ledger or flagged NEW_OR_CHANGED —
       a query cannot dodge the window by missing from both."""
    import __spark_entry__ as m
    from udata_datalake_service_spark.attestation import (
        CURRENT_ROUND,
        LAST_DRIVER_ROUND,
        NEW_OR_CHANGED,
        rotation_order,
    )

    names = list(m.queries())
    assert names == rotation_order(names)
    window = set(names[:50])
    present_new = NEW_OR_CHANGED & set(names)
    assert present_new <= window, sorted(present_new - window)
    period = -(-len(names) // 50)  # ceil(N/50): full-rotation rounds
    stale = {
        n: LAST_DRIVER_ROUND.get(n, 0)
        for n in names[50:]
        if LAST_DRIVER_ROUND.get(n, 0) < CURRENT_ROUND - (period - 1)
    }
    assert not stale, f"past-window entries too stale: {stale}"
    # 3b. the re-attestation period itself is capped. Round-10 decision
    # (VERDICT r9 #3, chosen deliberately rather than stumbled into):
    # cap raised 3 → 4 (registry may grow to 200). Rationale: the
    # staleness bound above is DERIVED from period, so it tightens or
    # relaxes automatically with N; rotation_order still attests
    # oldest-first so the worst case only materializes at N=200; and
    # between driver rows every entry is covered by the sha256 pin gate
    # (test_attested_entries_pinned) + local parity re-runs, so a
    # 4-round driver gap is a latency bound on INDEPENDENT attestation,
    # not an unverified window. Growth past 200 MUST fail here — then
    # the answer is folding redundant singletons (the u456/a234
    # precedent), never quiet staleness.
    assert period <= 4, (
        f"{len(names)} queries need ceil(N/50)={period} rounds per full "
        "re-attestation — retire/fold queries or widen the window"
    )
    unledgered = [
        n for n in names if n not in LAST_DRIVER_ROUND and n not in NEW_OR_CHANGED
    ]
    assert not unledgered, unledgered


def test_attested_entries_pinned():
    """Every entry NOT new/changed this round is pinned as
    sha256(oracle + source): an edit to an already-attested query fails
    here and forces a conscious re-attestation (tools/parity.py at
    sf0.01) followed by `python tools/pin_hashes.py`. Combined with
    test_rotation_invariants this gives the full guarantee: changed code
    is either flagged NEW_OR_CHANGED (and driver-attested this round) or
    caught as pin drift."""
    import json
    import os

    import __spark_entry__ as m  # noqa: F401  (registry import side effects)
    from tools.pin_hashes import compute_pins

    path = os.path.join(os.path.dirname(__file__), "pinned_queries.json")
    pinned = json.load(open(path))
    current = compute_pins()
    drift = {
        k: (pinned.get(k), v) for k, v in current.items() if pinned.get(k) != v
    }
    assert not drift, (
        "pinned queries changed since their last attestation - run "
        f"tools/parity.py on them at sf0.01, then tools/pin_hashes.py: {drift}"
    )
    # and nothing pinned may silently vanish from the registry
    assert set(pinned) <= set(current) | set(
        __import__(
            "udata_datalake_service_spark.attestation", fromlist=["NEW_OR_CHANGED"]
        ).NEW_OR_CHANGED
    ), sorted(set(pinned) - set(current))


def test_ledger_matches_committed_artifacts():
    """ADVICE r6: LAST_DRIVER_ROUND is hand-pasted from tools/attest_map.py
    output; the staleness bound catches too-LOW values but an inflated
    value would let a query dodge re-attestation. Recompute the ledger
    from the committed CORRECTNESS_r*.json artifacts and require exact
    equality — EXCEPT that a recomputed round equal to CURRENT_ROUND is
    expected-newer (the driver writes CORRECTNESS_r{CURRENT_ROUND}.json
    at round END, after the ledger paste; r7/r8 both went red for
    exactly this), so the pasted dict can be neither stale nor
    inflated yet survives the driver's own end-of-round artifact."""
    import os

    from tools.attest_map import last_green_rounds, ledger_diff
    from udata_datalake_service_spark.attestation import (
        CURRENT_ROUND,
        LAST_DRIVER_ROUND,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recomputed = last_green_rounds(repo)
    prev_green = last_green_rounds(repo, before=CURRENT_ROUND)
    # recomputed may contain queries since renamed/removed from the
    # registry; those are fine to drop from the ledger but a ledger entry
    # must never disagree with the artifacts.
    import __spark_entry__ as m

    names = set(m.queries())
    real_diff = ledger_diff(
        LAST_DRIVER_ROUND, recomputed, names, CURRENT_ROUND, prev_green
    )
    assert not real_diff, (
        "attestation ledger disagrees with committed CORRECTNESS artifacts "
        f"- rerun tools/attest_map.py and paste: {real_diff}"
    )


def test_ledger_survives_end_of_round_artifact(tmp_path):
    """Regression for the r7/r8 recurring red: when the driver drops
    CORRECTNESS_r{CURRENT_ROUND}.json at round end, the ledger (pasted at
    round start) must still validate — and an INFLATED ledger value must
    still fail."""
    import json
    import os

    from tools.attest_map import last_green_rounds, ledger_diff
    from udata_datalake_service_spark.attestation import CURRENT_ROUND

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import shutil
    for f in os.listdir(repo):
        if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
            shutil.copy(os.path.join(repo, f), tmp_path / f)
    # q_old was green in the PREVIOUS round (paste-time state), then the
    # driver's end-of-round artifact bumps it to CURRENT_ROUND
    prev_file = tmp_path / f"CORRECTNESS_r{CURRENT_ROUND - 1:02d}.json"
    prev_data = json.loads(prev_file.read_text()) if prev_file.exists() else {}
    prev_data["q_old"] = {"hash_match": True}
    prev_file.write_text(json.dumps(prev_data))
    # synthesize the driver's end-of-round artifact for CURRENT_ROUND
    synthetic = {
        "q_old": {"hash_match": True},       # was green in an earlier round
        "q_brand_new": {"hash_match": True},  # first-ever attestation
    }
    (tmp_path / f"CORRECTNESS_r{CURRENT_ROUND:02d}.json").write_text(
        json.dumps(synthetic)
    )
    recomputed = last_green_rounds(str(tmp_path))
    prev_green = last_green_rounds(str(tmp_path), before=CURRENT_ROUND)
    assert recomputed["q_old"] == CURRENT_ROUND
    assert prev_green["q_old"] == CURRENT_ROUND - 1
    ledger = {"q_old": CURRENT_ROUND - 1}  # pasted at round start
    names = {"q_old", "q_brand_new"}
    # expected-newer: both the bumped entry and the brand-new one pass
    assert ledger_diff(ledger, recomputed, names, CURRENT_ROUND, prev_green) == {}
    # anti-inflation preserved: a ledger value AHEAD of the artifacts,
    # or a stale mismatch below CURRENT_ROUND, still fails
    assert ledger_diff(
        {"q_old": CURRENT_ROUND + 1}, recomputed, names, CURRENT_ROUND, prev_green
    )
    old = {k: v for k, v in recomputed.items()}
    old["q_old"] = CURRENT_ROUND - 2  # artifacts say r-2, ledger says r-1
    assert ledger_diff(ledger, old, {"q_old"}, CURRENT_ROUND, prev_green)
    # ADVICE r9 tightening: an arbitrarily-stale pasted value no longer
    # rides the end-of-round carve-out — only the exact pre-paste round
    # (CURRENT_ROUND-1 here) is forgiven for a query green this round
    assert ledger_diff(
        {"q_old": CURRENT_ROUND - 3}, recomputed, names, CURRENT_ROUND, prev_green
    ) == {"q_old": (CURRENT_ROUND - 3, CURRENT_ROUND)}
