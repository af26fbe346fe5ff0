"""Compare two bench.py outputs with noise-aware annotation.

Usage:
    python tools/bench_diff.py BENCH_r03.json BENCH_r04.json [--threshold 0.15]
    python tools/bench_diff.py OLD NEW --attribute [--write-into BENCH_LOCAL_rNN.json]

Accepts either the raw one-line bench JSON or the driver's wrapper (which
stores it under "parsed"). Flags per-query deltas beyond the threshold,
and annotates the run with its loadavg fields (present since round 4) so
an externally-loaded run is visible instead of read as a regression.
Sub-second queries are held to an absolute floor (0.3 s) as well — their
relative noise is dominated by scheduling jitter.

``--attribute`` (VERDICT r12 task 7, the round-12 manual A/B as a
standing artifact): take the 3 most-inflated common queries, check out
the commit that produced OLD into a temporary git worktree, and re-time
those queries from BOTH checkouts on this machine, this session
(`tools/bench_queries.py`, one subprocess per side). Same-day parity
between the two checkouts means the round-over-round inflation is host
drift, not code. ``--write-into`` folds the result into the given
BENCH_LOCAL artifact as a ``drift_attribution`` block so the comparison
travels with the round's numbers.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    elif "queries" not in d and isinstance(d.get("tail"), str):
        # driver wrapper with unparsed output: bench's JSON is the last
        # JSON-looking line of the captured tail
        for line in reversed(d["tail"].splitlines()):
            line = line.strip().lstrip("\r")
            if line.startswith("{"):
                d = json.loads(line)
                break
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' field")
    return d


def attribute_drift(
    old_path: str,
    old_q: dict,
    new_q: dict,
    sf_dir: str,
    top_n: int = 3,
    reps: int = 3,
) -> dict:
    """Re-time the ``top_n`` most-inflated queries from a worktree of
    OLD's commit and from HEAD, same machine, back-to-back."""
    import os
    import shutil
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inflated = sorted(
        (k for k in new_q if k in old_q and old_q[k] > 0 and new_q[k] > 0),
        key=lambda k: -(new_q[k] - old_q[k]),
    )[:top_n]
    if not inflated:
        return {"error": "no common queries to attribute"}
    old_commit = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", os.path.basename(old_path)],
        cwd=repo, capture_output=True, text=True,
    ).stdout.strip()
    if not old_commit:
        return {"error": f"{old_path} has no committing revision"}

    runner = os.path.join(repo, "tools", "bench_queries.py")
    wt = tempfile.mkdtemp(prefix="bench-ab-")
    out: dict = {
        "queries": inflated,
        "old_commit": old_commit[:12],
        "reps": reps,
        "loadavg_start": round(os.getloadavg()[0], 2),
    }
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, old_commit],
            cwd=repo, check=True, capture_output=True,
        )
        for tag, root in (("old_code", wt), ("head_code", repo)):
            r = subprocess.run(
                [sys.executable, runner, "--repo", root, "--sf", sf_dir,
                 "--reps", str(reps), *inflated],
                capture_output=True, text=True, timeout=1800,
            )
            last = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
            out[tag] = json.loads(last)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=repo, capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    # the verdict: per-query ratio head/old-code TODAY (code effect) vs
    # artifact-recorded new/old (code + host drift). ~1.0 today-ratio
    # with an inflated artifact ratio = host drift, not a regression.
    out["today_ratio"] = {
        q: round(out["head_code"].get(q, -1) / out["old_code"][q], 3)
        for q in inflated
        if out.get("old_code", {}).get(q, 0) > 0
    }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.15)
    ap.add_argument("--abs-floor", type=float, default=0.3)
    ap.add_argument("--attribute", action="store_true")
    ap.add_argument("--write-into", default=None,
                    help="BENCH_LOCAL artifact to fold drift_attribution into")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]

    for tag, d in (("old", old), ("new", new)):
        la = (d.get("loadavg_start"), d.get("loadavg_end"))
        warn = ""
        if la[0] is not None and la[0] > 4:
            warn = "  << externally loaded at start: treat deltas as noise"
        print(
            f"{tag}: total={d.get('value')}s n={d.get('n_queries')} "
            f"warm={d.get('warm_sec')}s loadavg={la[0]}->{la[1]}{warn}"
        )

    common = [k for k in nq if k in oq and oq[k] >= 0 and nq[k] >= 0]
    print(f"\ncommon queries: {len(common)} "
          f"(only-old: {sorted(set(oq) - set(nq))or '-'}, "
          f"only-new: {sorted(set(nq) - set(oq)) or '-'})")

    regressions, improvements = [], []
    for k in common:
        a, b = oq[k], nq[k]
        delta = b - a
        if abs(delta) < args.abs_floor or abs(delta) < args.threshold * max(a, 0.01):
            continue
        (regressions if delta > 0 else improvements).append((delta, k, a, b))

    for title, rows in (("regressions", sorted(regressions, reverse=True)),
                        ("improvements", sorted(improvements))):
        print(f"\n{title}:")
        for delta, k, a, b in rows:
            print(f"  {k}: {a:.2f}s -> {b:.2f}s ({delta:+.2f}s)")
        if not rows:
            print("  none")

    tot_a = sum(oq[k] for k in common)
    tot_b = sum(nq[k] for k in common)
    print(f"\ncommon-query total: {tot_a:.1f}s -> {tot_b:.1f}s "
          f"({(tot_b - tot_a) / tot_a * 100 if tot_a else 0:+.1f}%)")

    if args.attribute:
        attr = attribute_drift(args.old, oq, nq, args.sf_dir)
        print("\ndrift_attribution:")
        print(json.dumps(attr, indent=1, sort_keys=True))
        if args.write_into:
            with open(args.write_into) as f:
                payload = json.load(f)
            payload["drift_attribution"] = attr
            with open(args.write_into, "w") as f:
                json.dump(payload, f, indent=1, sort_keys=True)
            print(f"folded into {args.write_into}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
