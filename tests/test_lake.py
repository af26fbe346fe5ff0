"""Lake sink tests: converted-table write/read/drop + registry (K1-K8)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from udata_datalake_service_spark.sinks.lake import Lake


def test_write_read_register_drop(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    url = "https://a.org/f.csv"
    name = hashlib.md5(url.encode()).hexdigest()

    n = lake.write_table(df, name)
    assert n == 2
    back = lake.read_table(name)
    assert sorted(r["v"] for r in back.collect()) == ["a", "b"]

    lake.register(name, {"encoding": "utf-8"}, "r1", url)
    reg = lake.registry()
    rows = reg.collect()
    assert len(rows) == 1 and rows[0]["parsing_table"] == name
    assert rows[0]["url"] == url

    lake.drop_table(name)
    assert lake.registry().count() == 0


def test_min_lines_floor(spark, tmp_path):
    # reference MIN_LINES_FOR_PARQUET=200 floor (config_default.toml:74-75)
    lake = Lake(spark, str(tmp_path / "lake2"))
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    n = lake.write_table(df, "small", min_lines_for_parquet=200)
    assert n == 10
    import pathlib

    assert not pathlib.Path(lake.table_path("small")).exists()


def test_index_columns_sort_within_partitions(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake3"))
    df = spark.createDataFrame([(i % 7, i) for i in range(100)], "k long, id long")
    lake.write_table(df.repartition(2), "sorted", index_columns=["k"])
    back = lake.read_table("sorted")
    assert back.count() == 100
