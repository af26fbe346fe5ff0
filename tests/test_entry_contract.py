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
