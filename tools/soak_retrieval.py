"""Measured soak for streaming BM25 index maintenance
(streaming/retrieval_stream.py) — per-epoch commit wall at ×N of sf0.1.

The claim under test is the commit-log cost model: committing epoch N
must NOT rewrite epochs 0..N-1 (`append_log_table_exactly_once` is
O(batch)), so per-epoch wall stays FLAT as the postings table grows
×N. The rewrite-based ledger path would show linearly growing epochs
(O(N²) total) on the same fixture. Also measured: probe wall from the
lake as the index grows (the unpruned full-index scan grows with the
corpus — exactly why `write_bm25_postings_partitioned` exists, whose
pruned probe is measured against it at final scale), a crash-replay
no-op, fold compaction invariance, and final lake-vs-whole-corpus
ranking equality.

Fixture: one shard per copy, suffix-salted per copy (the scale_probe
salting model — per-copy token vocabularies are disjoint, so the
copy-0 probes' posting lists stay CONSTANT-size while the index grows;
any probe-wall growth is scan cost, not list cost).

Fixture arg (VERDICT r11 task 2): `zipf` (default) — the
natural-statistics generator (llm/synthtext), on which the
partitioned-probe comparison becomes honest in BOTH directions: a
whole-document probe carries hundreds of distinct terms and hits ~all
64 buckets (pruning rightly wins nothing), while a term-sparse probe
(an eval question) keeps the ≤ min(q, 64)-bucket read bound. The old
31-token fixture made even whole-doc probes "sparse" and overstated
the prune win. `legacy` re-runs the documents-table fixture.

Usage: python tools/soak_retrieval.py [sf_dir] [scale] [zipf|legacy]
Prints a markdown table; paste into SOAK.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    fixture = sys.argv[3] if len(sys.argv) > 3 else "zipf"
    assert fixture in ("zipf", "legacy"), fixture

    import os
    import shutil

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.llm.retrieval import (
        bm25_topk,
        read_bm25_postings_pruned,
        write_bm25_postings_partitioned,
    )
    from udata_datalake_service_spark.session import get_spark
    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.streaming.retrieval_stream import (
        bm25_from_lake,
        bm25_index_stream,
    )

    spark = get_spark()
    root = "/tmp/spark_hydra_soak_retrieval"
    shutil.rmtree(root, ignore_errors=True)
    shards_dir = f"{root}/shards"
    os.makedirs(shards_dir, exist_ok=True)
    lake = Lake(spark, f"{root}/lake")

    if fixture == "zipf":
        from udata_datalake_service_spark.llm.synthtext import zipf_documents

        zipf_documents(spark, 5000, seed="soak-zipf", num_partitions=32).write.mode(
            "overwrite"
        ).parquet(f"{root}/base_docs")
        docs = spark.read.parquet(f"{root}/base_docs")
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    probes = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    probes.persist().count()

    def shard_df(i: int):
        body = (
            F.col("text")
            if i == 0
            else F.regexp_replace(F.col("text"), r"([A-Za-z0-9]+)", f"$1s{i}")
        )
        return docs.select(
            (F.col("doc_id") + F.lit(i * n0)).alias("doc_id"),
            body.alias("text"),
            "lang",
            "source",
            F.length(body).cast("long").alias("n_chars"),
        )

    def drop_shard(i: int) -> None:
        stage = f"{root}/stage-{i:02d}"
        shard_df(i).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        os.replace(
            os.path.join(stage, part),
            os.path.join(shards_dir, f"shard-{i:02d}.parquet"),
        )
        shutil.rmtree(stage)

    print(f"fixture: {scale} epochs × {n0} docs ({sf_dir})", flush=True)
    rows = []
    for i in range(scale):
        drop_shard(i)
        t0 = time.monotonic()
        q = bm25_index_stream(spark, shards_dir, lake, f"{root}/ckpt")
        q.awaitTermination(3600)
        commit_s = time.monotonic() - t0
        probe_s = None
        if i in (0, scale // 4, scale // 2, scale - 1):
            t0 = time.monotonic()
            bm25_from_lake(lake, probes, k=10).write.format("noop").mode(
                "overwrite"
            ).save()
            probe_s = time.monotonic() - t0
        rows.append((i, commit_s, probe_s))
        print(
            f"epoch {i:02d}: commit {commit_s:.2f}s"
            + (f", lake probe {probe_s:.2f}s" if probe_s else ""),
            flush=True,
        )

    # flat-commit verdict: mean of the last quarter vs the first quarter
    qlen = max(1, scale // 4)
    head = sum(r[1] for r in rows[:qlen]) / qlen
    tail = sum(r[1] for r in rows[-qlen:]) / qlen
    n_post = lake.read_log_table("bm25_postings").count()

    # replay with nothing new: no epoch commits
    t0 = time.monotonic()
    q = bm25_index_stream(spark, shards_dir, lake, f"{root}/ckpt")
    q.awaitTermination(3600)
    replay_s = time.monotonic() - t0
    assert lake.read_log_table("bm25_postings").count() == n_post

    # lake probe == whole-corpus batch build, value for value
    whole = spark.read.parquet(shards_dir)
    want = sorted(map(tuple, bm25_topk(whole, probes, k=10).collect()))
    got = sorted(map(tuple, bm25_from_lake(lake, probes, k=10).collect()))
    assert got == want, "lake index diverged from whole-corpus build"

    # fold compaction: identical ranking, one batch dir
    stats = lake.compact_log_table("bm25_postings")
    got_c = sorted(map(tuple, bm25_from_lake(lake, probes, k=10).collect()))
    assert got_c == want
    t0 = time.monotonic()
    bm25_from_lake(lake, probes, k=10).write.format("noop").mode("overwrite").save()
    probe_compacted_s = time.monotonic() - t0

    # partitioned layout: pruned probe vs the full-index scan. Two query
    # shapes, with the MEASURED bucket coverage printed per shape — the
    # pruning win is proportional to the fraction of buckets a probe's
    # term set misses, so a whole-document probe over a rich vocabulary
    # (hundreds of distinct terms → every bucket) gains nothing while a
    # term-sparse probe (an eval question, a keyword query) reads ≤ q
    # of the bucket dirs. NOTE the synthetic corpus has only 31 base
    # tokens, so on THIS fixture even whole-doc probes are term-sparse;
    # the bucket counts below make the coverage explicit instead of
    # overclaiming either way.
    part_path = f"{root}/postings_by_bucket"
    write_bm25_postings_partitioned(
        lake.read_log_table("bm25_postings").select("term", "doc_id", "tf", "dl"),
        part_path,
        num_buckets=64,
    )
    stats_df = lake.read_app_table("bm25_stats").agg(
        F.sum("n_docs").alias("n_docs"), F.sum("total_dl").alias("total_dl")
    )

    from udata_datalake_service_spark.llm.text import tokens as _toks

    def n_buckets(qdf) -> int:
        return (
            qdf.select(F.explode(F.array_distinct(_toks(F.col("text")))).alias("t"))
            .select(F.pmod(F.hash("t"), F.lit(64)).alias("b"))
            .distinct()
            .count()
        )

    def probe_wall(qdf):
        full = bm25_topk(whole, qdf, k=10)
        pruned_p = read_bm25_postings_pruned(spark, part_path, qdf, num_buckets=64)
        pr = bm25_topk(None, qdf, k=10, postings=pruned_p, stats=stats_df)
        assert sorted(map(tuple, pr.collect())) == sorted(
            map(tuple, full.collect())
        ), "pruned probe diverged"
        t0 = time.monotonic()
        bm25_topk(
            None, qdf, k=10, postings=pruned_p, stats=stats_df
        ).write.format("noop").mode("overwrite").save()
        p_s = time.monotonic() - t0
        t0 = time.monotonic()
        bm25_topk(
            None,
            qdf,
            k=10,
            postings=lake.read_log_table("bm25_postings").select(
                "term", "doc_id", "tf", "dl"
            ),
            stats=stats_df,
        ).write.format("noop").mode("overwrite").save()
        f_s = time.monotonic() - t0
        return f_s, p_s

    dense_full_s, dense_pruned_s = probe_wall(probes)
    # term-sparse probes: 3 copy-0 content tokens per query (an eval
    # question / keyword query) — ≤3 of the 64 buckets each. On the
    # legacy fixture these are hand-picked from its 31-token vocab; on
    # zipf they are drawn from real base docs (salting keeps copy-0
    # content vocabularies disjoint from the other copies).
    if fixture == "zipf":
        srows = []
        for r in probes.collect()[:2]:
            ws = [w for w in r["text"].split() if len(w) >= 6][:3]
            srows.append((r["query_id"], " ".join(ws)))
        sparse = spark.createDataFrame(srows, "query_id long, text string")
    else:
        sparse = spark.createDataFrame(
            [(0, "dup merge scan"), (1, "vector window batch")],
            "query_id long, text string",
        )
    sparse_full_s, sparse_pruned_s = probe_wall(sparse)

    print(f"\n{scale}×{n0} docs → {n_post} posting rows; "
          f"epoch wall first-quarter mean {head:.2f}s vs last-quarter mean "
          f"{tail:.2f}s (flat-commit ratio {tail / head:.2f}); replay "
          f"{replay_s:.1f}s, 0 new commits; fold: {stats['batches_folded']} "
          f"dirs → 1, ranking identical (compacted-lake probe "
          f"{probe_compacted_s:.2f}s); probe walls full-scan vs pruned — "
          f"whole-doc queries {dense_full_s:.2f}s vs {dense_pruned_s:.2f}s "
          f"({n_buckets(probes)}/64 buckets), sparse queries "
          f"{sparse_full_s:.2f}s vs {sparse_pruned_s:.2f}s "
          f"({n_buckets(sparse)}/64 buckets)")
    print("| epoch | commit s | lake probe s |")
    print("|---|---|---|")
    for i, c, p in rows:
        print(f"| {i} | {c:.2f} | {'' if p is None else f'{p:.2f}'} |")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
