"""Compare two bench.py outputs with noise-aware annotation.

Usage:
    python tools/bench_diff.py BENCH_r03.json BENCH_r04.json [--threshold 0.15]

Accepts either the raw one-line bench JSON or the driver's wrapper (which
stores it under "parsed"). Flags per-query deltas beyond the threshold,
and annotates the run with its loadavg fields (present since round 4) so
an externally-loaded run is visible instead of read as a regression.
Sub-second queries are held to an absolute floor (0.3 s) as well — their
relative noise is dominated by scheduling jitter.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.15)
    ap.add_argument("--abs-floor", type=float, default=0.3)
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
