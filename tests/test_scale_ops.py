"""Skew salting + bucketed co-located joins: result identity and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udata_datalake_service_spark.operators.core import salted_count, salted_join
from udata_datalake_service_spark.sinks.lake import Lake

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def skewed(spark):
    # 90% of rows share one hot key — the shape that melts a plain shuffle
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.range(50).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))
    plain = sorted(map(tuple, skewed.join(dim, on="k").select("k", "payload", "name").collect()))
    salted = sorted(map(tuple, salted_join(skewed, dim, on="k").select("k", "payload", "name").collect()))
    assert salted == plain
    assert len(plain) > 0


def test_salted_join_left_outer_matches(spark, skewed):
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("name"))
    plain = sorted(
        map(tuple, skewed.join(dim, on="k", how="left").select("k", "payload", "name").collect()),
        key=str,
    )
    salted = sorted(
        map(tuple, salted_join(skewed, dim, on="k", how="left").select("k", "payload", "name").collect()),
        key=str,
    )
    assert salted == plain


def test_salted_count_matches_direct_groupby(spark, skewed):
    direct = {r["k"]: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count(skewed, ["k"]).collect()}
    assert salted == direct


def test_salted_count_splits_hot_key_into_partials(spark, skewed):
    # the pre-aggregation really splits the hot key: >1 partial group for k=7
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in skewed.columns])), F.lit(8))
    partials = (
        skewed.withColumn("__salt", salt).groupBy("k", "__salt").count()
        .filter(F.col("k") == 7).count()
    )
    assert partials > 1


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key: the join plan must contain no
    Exchange on either side — the write-time bucketing IS the shuffle."""
    lake = Lake(spark, str(tmp_path))
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    t_o = lake.write_bucketed_table(orders, "orders_b", ["o_custkey"], 8)
    t_c = lake.write_bucketed_table(customer, "cust_b", ["c_custkey"], 8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(t_o)
            .join(spark.table(t_c), F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "c_name")
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        assert "Exchange" not in tree
        assert "SortMergeJoin" in tree
        # and it still returns the right rows
        expect = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert j.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    """groupBy on the bucket key aggregates map-side only."""
    lake = Lake(spark, str(tmp_path))
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    t_o = lake.write_bucketed_table(orders, "orders_b2", ["o_custkey"], 8)
    try:
        g = spark.table(t_o).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
        plan = g._sc._jvm.PythonSQLUtils.explainString(
            g._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan.split("\n\n")[0]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")


def test_date_partitioned_checks_prune_on_date_filter(spark, tmp_path):
    """checks is partitioned by check_date (SURVEY §1.5): a date-filtered
    aggregate must prune to the matching partition at planning time —
    retention and per-date dashboards never scan the full history."""
    lake = Lake(spark, str(tmp_path))
    checks = spark.createDataFrame(
        [(i, f"2024-01-{(i % 5) + 1:02d}", 200) for i in range(100)],
        "check_id long, check_date string, status int",
    )
    lake.write_app_table(checks, "checks", partition_by=["check_date"])
    df = lake.read_app_table("checks").filter(F.col("check_date") == "2024-01-03")
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # the predicate lands in PartitionFilters (pruned listing), not in
    # PushedFilters/post-scan Filter
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "check_date" in pf_line
    assert df.count() == 20


def test_morton_key_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs single-column sort, measured on real parquet stats:
    range-partition+sort lineitem by (a) l_orderkey and (b) the morton
    interleave of both keys; with (a), every file's l_partkey min/max span
    is ~the full domain (no skipping possible on partkey predicates); with
    (b), BOTH columns' per-file spans shrink — the property that lets
    row-group stats prune scans on either column."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from udata_datalake_service_spark.functions.hashing import morton_key

    # 6-bit quantized domains + 32 files: each file's z-span then pins the
    # top 3 bits of BOTH dimensions (span ~ domain/8). The quantization
    # width is the call-site policy morton_key documents.
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .withColumn("a", F.col("l_orderkey") % 64)
        .withColumn("b", F.col("l_partkey") % 64)
    )

    def spans(path: str, col: str) -> float:
        import glob

        total, n = 0, 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += st.max - st.min
                n += 1
        return total / max(n, 1)

    p1 = str(tmp_path / "by_orderkey")
    li.repartitionByRange(32, "a").sortWithinPartitions("a").write.parquet(p1)
    p2 = str(tmp_path / "by_morton")
    z = morton_key(F.col("a"), F.col("b"), bits=6)
    li.withColumn("z", z).repartitionByRange(32, "z").sortWithinPartitions(
        "z"
    ).drop("z").write.parquet(p2)

    domain = 63
    # single-column sort leaves partkey unclustered: near-full span per file
    assert spans(p1, "b") > 0.8 * domain
    # morton shrinks BOTH dimensions' spans well below the domain
    assert spans(p2, "b") < 0.5 * domain
    assert spans(p2, "a") < 0.5 * domain
