"""Physical-plan audit: one row per contract query, the scale signals.

Emits PLANS.md — for every ``queries()`` entry at sf0.001: Exchange
count, broadcast vs sort-merge joins, whole-stage-codegen span count,
whether any parquet scan carries PushedFilters, and the worst join shape
found (cartesian / broadcast-nested-loop), so a reviewer can see each
query's executed shape without running ``.explain`` 100 times. Queries
whose builders execute eagerly (lake writes, iterative CC, settled
wrappers) expose their FINAL plan — noted in the header.

Usage: python tools/plan_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"

    import __spark_entry__ as entry_mod
    from udata_datalake_service_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    rows = []
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            tree = plan.split("\n\n")[0]
            import re as _re

            codegen_ids = _re.findall(r"\[codegen id : (\d+)\]", plan)
            flags = []
            if "CartesianProduct" in tree:
                flags.append("CARTESIAN")
            if "BroadcastNestedLoopJoin" in tree:
                flags.append("BNLJ")
            rows.append(
                {
                    "query": name,
                    "exchanges": tree.count("Exchange"),
                    "bhj": tree.count("BroadcastHashJoin"),
                    "smj": tree.count("SortMergeJoin"),
                    "wscg": max((int(i) for i in codegen_ids), default=0),
                    "pushed": "yes"
                    if any(
                        seg.split("]")[0].strip()
                        for seg in plan.split("PushedFilters: [")[1:]
                    )
                    else "-",
                    "flags": ",".join(flags) or "-",
                    "build_s": round(time.time() - t0, 1),
                }
            )
        except Exception as e:  # noqa: BLE001
            rows.append({"query": name, "exchanges": "ERR", "bhj": "", "smj": "",
                         "wscg": "", "pushed": "", "flags": str(e)[:60],
                         "build_s": round(time.time() - t0, 1)})
        spark.catalog.clearCache()

    with open(out_md, "w") as f:
        f.write(
            "# PLANS — physical-plan audit (`tools/plan_audit.py`, "
            f"sf_dir={sf_dir})\n\n"
            "One row per driver-contract query: Exchange count, broadcast "
            "(BHJ) vs sort-merge (SMJ) joins, WholeStageCodegen spans, "
            "whether any parquet scan has non-empty PushedFilters, and "
            "scale-hostile join flags (none expected — pinned by "
            "tests/test_physical_plans.py). Queries that execute eagerly "
            "during construction (lake writes, iterative propagation, "
            "settled wrappers that materialize + release caches) show "
            "their FINAL plan; their internal shapes are pinned by their "
            "own unit tests. WSCG counts codegen ids in the PRE-execution "
            "formatted plan — AQE-wrapped multi-stage plans assign ids at "
            "execution and may show 0 here.\n\n"
            "| query | exchanges | BHJ | SMJ | WSCG | pushed filters | flags | build s |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['query']} | {r['exchanges']} | {r['bhj']} | {r['smj']} "
                f"| {r['wscg']} | {r['pushed']} | {r['flags']} | {r['build_s']} |\n"
            )
    n_bad = sum(1 for r in rows if r["flags"] not in ("-",) and r["exchanges"] != "ERR")
    n_err = sum(1 for r in rows if r["exchanges"] == "ERR")
    print(f"wrote {out_md}: {len(rows)} queries, {n_bad} flagged, {n_err} errors")
    spark.stop()
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
