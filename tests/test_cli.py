"""CLI verb bindings (reference cli.py:50-381 → cli.py here), exercised as
functions against a temp lake (reference tests/test_cli.py:27-148 model:
purge shared-URL edge cases, catalog reload semantics)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from udata_datalake_service_spark.cli import (
    analyse_csv,
    insert_resource,
    load_catalog,
    purge_checks,
    purge_csv_tables,
)
from udata_datalake_service_spark.sinks.lake import Lake


def test_load_catalog_then_reload_marks_leavers_deleted(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    p1 = tmp_path / "cat1.csv"
    p1.write_text(
        "dataset.id;resource_id;url;dataset.archived\n"
        "d1;r1;https://a.org/1.csv;False\n"
        "d1;r2;https://a.org/2.csv;False\n",
        encoding="utf-8",
    )
    assert load_catalog(spark, lake, str(p1)) == 2

    # reload without r2 → r2 soft-deleted, r1 survives un-deleted
    p2 = tmp_path / "cat2.csv"
    p2.write_text(
        "dataset.id;resource_id;url;dataset.archived\n"
        "d1;r1;https://a.org/1.csv;False\n",
        encoding="utf-8",
    )
    load_catalog(spark, lake, str(p2))
    got = {r["resource_id"]: r["deleted"] for r in lake.read_app_table("catalog").collect()}
    assert got == {"r1": False, "r2": True}

    insert_resource(spark, lake, "d2", "r3", "https://b.org/3.csv")
    assert lake.read_app_table("catalog").filter(F.col("resource_id") == "r3").count() == 1


def test_analyse_csv_and_orphan_purge(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake2"))
    csv = tmp_path / "data.csv"
    csv.write_text("id;v\n1;a\n2;b\n", encoding="utf-8")
    url = "https://a.org/data.csv"
    name = analyse_csv(spark, lake, str(csv), url=url, resource_id="r1")
    assert name == hashlib.md5(url.encode()).hexdigest()
    assert lake.read_table(name).count() == 2
    assert lake.registry().filter(F.col("parsing_table") == name).count() == 1

    # catalog WITHOUT that url + a check row pointing at the table → orphan
    catalog = spark.createDataFrame(
        [(1, "r9", "https://other.org/x.csv", False)],
        "id long, resource_id string, url string, deleted boolean",
    )
    checks = spark.createDataFrame(
        [(1, url, name)], "id long, url string, parsing_table string"
    )
    lake.write_app_table(catalog, "catalog")
    lake.write_app_table(checks, "checks")
    dropped = purge_csv_tables(spark, lake)
    assert dropped == [name]
    assert lake.registry().filter(F.col("parsing_table") == name).count() == 0


def test_purge_checks_retention(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake3"))
    now = dt.datetime.utcnow()
    rows = [
        (1, "r1", now - dt.timedelta(days=100)),
        (2, "r1", now - dt.timedelta(days=1)),
    ]
    lake.write_app_table(
        spark.createDataFrame(rows, "id long, resource_id string, created_at timestamp"),
        "checks",
    )
    assert purge_checks(spark, lake, retention_days=60) == 1
    assert [r["id"] for r in lake.read_app_table("checks").collect()] == [2]


def test_curate_docs_verb(spark, tmp_path):
    """curate-docs: exact dups drop first, then the Gopher gate; the
    written parquet contains exactly the survivors and the report's
    funnel counts reconcile."""
    from udata_datalake_service_spark.cli import curate_docs

    good = (
        "the quick brown fox jumps over that lazy dog and dogs have played "
        "with plenty of patience watching every single visitor today "
        + " ".join(f"uniq{i:02d} tokn{i:02d}" for i in range(20))
    )
    rows = [
        (1, good),
        (2, good + " extra"),        # near-dup but not exact: survives dedup
        (3, good),                   # exact dup of 1 -> dropped (higher id)
        (4, "spam ham spam ham spam ham spam ham"),  # fails the gate
    ]
    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    report = curate_docs(spark, src, out_path=out)
    assert report["n_in"] == 4
    assert report["n_after_exact_dedup"] == 3
    assert report["n_gopher_pass"] == 2
    assert report["pass_rate"] == 0.5
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2}

    # decontamination leg: an eval set sharing doc 2's unique 5-grams
    # knocks it out before the gate
    bench = str(tmp_path / "bench_in")
    spark.createDataFrame(
        [(100, good + " extra")], "doc_id long, text string"
    ).write.parquet(bench)
    report2 = curate_docs(spark, src, benchmark_path=bench)
    assert report2["n_after_exact_dedup"] == 3
    # docs 1 and 2 both share the long opener's 5-grams with the bench doc
    assert report2["n_after_decontam"] == 1
    assert report2["n_gopher_pass"] == 0  # only the spam doc remains


def test_bpe_train_verb_persists_merge_table(spark, tmp_path):
    from udata_datalake_service_spark.cli import bpe_train_verb

    src = str(tmp_path / "docs_bpe")
    spark.createDataFrame(
        [(1, "low low low lower newest newest newest")], "doc_id long, text string"
    ).write.parquet(src)
    lake = Lake(spark, str(tmp_path / "lake"))
    report = bpe_train_verb(spark, lake, src, num_merges=3, table="bpe")
    assert report == {"merges": 3, "table": "bpe"}
    back = lake.read_app_table("bpe").orderBy("rank").collect()
    assert [r["rank"] for r in back] == [1, 2, 3]
    assert all(r["pair_count"] > 0 for r in back)


def test_analyse_csv_reports_schema_drift_on_reanalysis(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    p1 = tmp_path / "r1.csv"
    p1.write_text("id,price\n1,2.5\n2,3.5\n")
    url = "https://a.org/drifting.csv"
    seen: list = []
    analyse_csv(spark, lake, str(p1), url=url, on_drift=seen.append)
    assert seen == []  # first analysis: nothing to drift against

    p2 = tmp_path / "r2.csv"
    p2.write_text("id,price,qty\n1,hello,4\n2,world,5\n")
    analyse_csv(spark, lake, str(p2), url=url, on_drift=seen.append)
    assert len(seen) == 1
    changes = {(d["column"], d["change"]) for d in seen[0]}
    assert ("qty", "added") in changes
    assert ("price", "retyped") in changes


def test_corpus_diagnostic_verbs(spark, tmp_path, capsys):
    """The round-5 CLI verbs: novelty / paragraph-dedup / padding-waste
    each print a JSON report over a documents parquet."""
    import json as _json

    from udata_datalake_service_spark import cli

    src = str(tmp_path / "docs")
    rows = [(i, f"tok{i} tok{i + 1} tok{i + 2} shared shared") for i in range(30)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    lake_root = str(tmp_path / "lake")

    assert cli.main(["--lake-root", lake_root, "novelty", src, "--k", "2"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_docs"] == 30 and 0 < rep["corpus_novelty"] <= 1

    out_dir = str(tmp_path / "cleaned")
    assert (
        cli.main(
            ["--lake-root", lake_root, "paragraph-dedup", src,
             "--para-tokens", "5", "--out", out_dir]
        )
        == 0
    )
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_docs"] == 30 and rep["n_kept"] <= rep["n_paras"]
    assert spark.read.parquet(out_dir).count() == 30

    assert (
        cli.main(["--lake-root", lake_root, "padding-waste", src,
                  "--batch-size", "8"]) == 0
    )
    lines = [
        _json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()[-2:]
    ]
    assert {r["strategy"] for r in lines} == {"arrival", "length_sorted"}


def test_dq_check_verb(spark, tmp_path, capsys):
    import json as _json

    from udata_datalake_service_spark import cli

    src = str(tmp_path / "rows")
    spark.createDataFrame(
        [(1, 10), (2, -3), (3, 5)], "id long, v long"
    ).write.parquet(src)
    q = str(tmp_path / "bad")
    rc = cli.main(
        ["--lake-root", str(tmp_path / "lake"), "dq-check", src,
         "v_positive:v > 0", "id_small:id <= 2", "--quarantine", q]
    )
    assert rc == 0
    rep = {r["rule"]: r["n_violations"] for r in
           (_json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines())}
    assert rep == {"_any_": 2, "id_small": 1, "v_positive": 1}
    assert spark.read.parquet(q).count() == 2
