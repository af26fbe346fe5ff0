"""Guard: no oracle output column may carry a DuckDB type that pandas
converts to float64/object when the values are integral.

Root cause of the round-4 driver hash-reds (``dd_span_coverage``,
``tx_vocab_coverage``, ``sessionize``, ``pack_stream``): DuckDB types
``SUM(BIGINT)`` as HUGEINT (int128), and ``rel.df()`` converts HUGEINT to
float64 — so a driver-side pandas fetch renders ``3`` as ``"3.0"`` while
the Spark side renders ``"3"``, failing the value hash even though every
cell is numerically identical (``fetchall()``, which tools/parity.py uses,
returns Python ints and hides the skew).  The fix is oracle-side
``CAST(... AS BIGINT)``; this test keeps any future oracle from
reintroducing the hazard.  Binding via ``rel.types`` does not execute the
query, so the whole catalog is checked in milliseconds.
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SF_DIR = "/root/testdata/sf0.001"

# Types whose pandas conversion is float64/object even for integral values.
HAZARD = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER"}


@pytest.fixture(scope="module")
def oracle_catalog():
    import __spark_entry__ as entry_mod

    return entry_mod.oracle_sql()


def test_no_oracle_emits_pandas_hostile_integer_types(oracle_catalog):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in oracle_catalog.items():
        rel = con.sql(sql)  # binds only; no execution
        flagged = [
            (col, str(ty))
            for col, ty in zip(rel.columns, rel.types)
            if str(ty) in HAZARD or str(ty).startswith("DECIMAL")
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "oracle columns with pandas-float-converting DuckDB types "
        f"(wrap in CAST(... AS BIGINT)): {offenders}"
    )
