"""The reference's performance canary, ported (SURVEY §5 taxonomy 6).

Reference: tests/test_analysis/test_analysis_csv.py:52-86 — a 45,522-row
CSV must complete full inspection (num_rows=-1), typed load, and profile
inside one worker job's RQ_DEFAULT_TIMEOUT=180 s (config_default.toml:66).
Here the same row count goes sniff → distributed type vote → smart_cast →
lake write → registry → read-back, with the same wall-clock ceiling.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

CANARY_ROWS = 45_522  # the reference fixture's exact row count


@pytest.mark.slow
def test_45k_row_ingest_canary(spark, tmp_path):
    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.sources.inference import inspect_csv

    p = tmp_path / "canary.csv"
    with open(p, "w", encoding="utf-8") as fh:
        fh.write("id;nom;montant;date_maj;commentaire\n")
        for i in range(CANARY_ROWS):
            fh.write(
                f"{i};diag-{i % 997};{i % 5000},{i % 100:02d};"
                f"{1 + i % 28:02d}/{1 + i % 12:02d}/202{i % 4};note {i % 13}\n"
            )

    t0 = time.time()
    typed, insp = inspect_csv(spark, str(p))
    lake = Lake(spark, str(tmp_path / "lake"))
    n = lake.write_table(typed.drop("__id"), "canary", index_columns=["id"])
    lake.register("canary", insp.to_dict(), resource_id="r-canary", url="x")
    back = lake.read_table("canary")
    assert back.count() == CANARY_ROWS
    elapsed = time.time() - t0

    assert n == CANARY_ROWS
    assert insp.total_lines == CANARY_ROWS
    assert insp.columns["id"]["python_type"] == "int"
    assert insp.columns["montant"]["python_type"] == "float"
    assert insp.columns["date_maj"]["python_type"] == "date"
    # spot-check a typed value incl. the French decimal
    row = back.filter(F.col("id") == 123).collect()[0]
    assert row["montant"] == 123.23
    # the reference's ceiling, with generous margin to stay a tripwire,
    # not a flake (it runs in a few seconds here)
    assert elapsed < 180, f"canary took {elapsed:.0f}s (reference ceiling 180s)"
