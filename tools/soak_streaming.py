"""Streaming curation soak (VERDICT r10 task 5).

The continuous-ingest 100 TB shape (the reference's crawler loop,
SURVEY §2.8) composed and MEASURED: an append-only shard directory
drives one Structured Streaming query through

  stream_documents (file source, 1 shard per trigger)
    → exact_dedup_stream      (stateful cross-batch fingerprint dedup)
    → foreachBatch sink:
        gopher STRICT gate    (n_fail=0, per-batch — map-only anyway)
        → exactly-once corpus append   (epoch-keyed lake ledger)
        → per-batch KMV sketch build
        → exactly-once sketch append   (sk_lake_rollup's streaming twin)

with per-batch rows/wall recorded, a REAL injected crash between the
two sink appends (epoch N commits the corpus rows, dies before the
sketch), and three checkpoint restarts:

  run 1: shards 0..15, crash injected mid-run
  run 2: same checkpoint — Spark replays the crashed epoch with the
         SAME id; the corpus append no-ops against the ledger (captured
         in the metrics), the sketch append commits, the drain finishes
  run 3: shards 16..31 appended — only the new shards are processed
  run 4: nothing new — zero batches, all row counts unchanged

Final verification from the LAKE alone: corpus rows == distinct
fingerprints that survived the gate (exactly-once end to end despite
the crash), and the merged per-epoch KMV sketches are hash-for-hash
identical to a fresh whole-corpus sketch (min-k merge law) — so NDV is
answerable without rescanning raw data.

Prints a per-batch markdown table; paste into SOAK.md §streaming.

Usage: python tools/soak_streaming.py [sf_dir] [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

K = 64  # KMV sketch size


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import os
    import shutil

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.llm.gopher import gopher_quality
    from udata_datalake_service_spark.operators.sketch import (
        kmv_build,
        kmv_merge,
    )
    from udata_datalake_service_spark.session import get_spark
    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.streaming.dedup_stream import (
        exact_dedup_stream,
        stream_documents,
    )
    from udata_datalake_service_spark.streaming.sketch_stream import (
        kmv_ndv_from_lake,
    )

    spark = get_spark()
    root = "/tmp/spark_hydra_soak_stream"
    shutil.rmtree(root, ignore_errors=True)
    shards_dir = f"{root}/shards"
    ckpt = f"{root}/ckpt"
    os.makedirs(shards_dir, exist_ok=True)
    lake = Lake(spark, f"{root}/lake")
    prefix = "soakstream"
    crash_flag = f"{root}/ARM_CRASH"  # file, so intent survives restarts

    # ---- fixture: same three-tier English-like corpus as the batch soak
    # (opener per base doc, letters-only salts), ONE SHARD PER COPY so
    # exact-dup families (copies 0,8,16,24) cross micro-batch boundaries
    # and the stateful dedup state is genuinely exercised across epochs.
    openers = [
        "the quick brown fox jumps over that lazy dog and friends have fun with plenty of grace today",
        "we went to the old market and that seller would have fresh bread with butter for everyone there",
        "the long road runs north of town and people that travel it have good views with every turn",
        "a boat can be moored to the dock and sailors that arrive have stories with plenty of salt",
        "the garden grows east of the wall and roses that bloom there have color with morning light",
        "students like to read in the library and books that help them have notes with clear margins",
        "the river bends south of the bridge and herons that nest there have patience with every tide",
        "cooks like to season the broth with care and guests that visit have bowls of it each night",
    ]
    opener_col = F.element_at(
        F.array(*[F.lit(o) for o in openers]),
        (F.col("doc_id") % 8 + 1).cast("int"),
    )

    def _alpha26(i: int) -> str:
        s, i = "", i + 1
        while i:
            s += chr(ord("a") + i % 26)
            i //= 26
        return s

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    def write_shard(i: int) -> None:
        if i % 8 == 0:
            body = F.col("text")
        else:
            body = F.regexp_replace(
                F.col("text"), r"([A-Za-z0-9]{3,})", f"$1s{_alpha26(i)}"
            )
        txt = F.concat(opener_col, F.lit(" "), body)
        shard = docs.select(
            (F.col("doc_id") + F.lit(i * n0)).alias("doc_id"),
            txt.alias("text"),
            "lang",
            "source",
            F.length(txt).cast("long").alias("n_chars"),
        )
        tmp = f"{root}/stage-{i:02d}"
        shard.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        os.replace(
            os.path.join(tmp, part), os.path.join(shards_dir, f"shard-{i:02d}.parquet")
        )
        shutil.rmtree(tmp)

    # ---- the composed sink --------------------------------------------
    batch_log: list[dict] = []

    def sink(batch_df, epoch_id: int) -> None:
        t0 = time.monotonic()
        batch_df.persist()
        n_in = batch_df.count()
        g = gopher_quality(batch_df, text="text", id_col="doc_id")
        kept = g.filter(F.col("gopher_pass")).select("doc_id")
        survivors = batch_df.join(kept, "doc_id", "left_semi").select(
            "doc_id", "lang", "source", "n_chars", "fp"
        ).persist()
        n_kept = survivors.count()
        c_new = lake.append_app_table_exactly_once(
            survivors, "corpus_docs", f"{prefix}-c-{epoch_id}"
        )
        if os.path.exists(crash_flag) and epoch_id >= crash_epoch:
            os.remove(crash_flag)
            batch_df.unpersist()
            survivors.unpersist()
            raise RuntimeError(
                f"injected crash in epoch {epoch_id}: corpus committed, "
                "sketch NOT — restart must replay this epoch and the "
                "corpus append must no-op"
            )
        sk = kmv_build(survivors, "fp", ["lang"], K).withColumn(
            "batch_epoch", F.lit(int(epoch_id))
        )
        s_new = lake.append_app_table_exactly_once(
            sk, "kmv_batches", f"{prefix}-s-{epoch_id}"
        )
        batch_df.unpersist()
        survivors.unpersist()
        batch_log.append(
            {
                "epoch": int(epoch_id),
                "rows_in": n_in,
                "gate_kept": n_kept,
                "corpus_committed": bool(c_new),
                "sketch_committed": bool(s_new),
                "wall_s": round(time.monotonic() - t0, 1),
            }
        )
        print(f"  epoch {epoch_id}: {n_in} -> {n_kept}, "
              f"corpus_new={c_new} sketch_new={s_new}, "
              f"{batch_log[-1]['wall_s']}s", flush=True)

    def run_stream(tag: str) -> tuple[bool, float]:
        t0 = time.monotonic()
        q = (
            exact_dedup_stream(stream_documents(spark, shards_dir))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        crashed = False
        try:
            q.awaitTermination(1800)
        except Exception as e:  # noqa: BLE001
            crashed = True
            print(f"  [{tag}] stream FAILED (expected if crash armed): "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
        dt = time.monotonic() - t0
        print(f"  [{tag}] done in {dt:.1f}s, crashed={crashed}", flush=True)
        return crashed, dt

    # ---- run 1: first half, crash armed --------------------------------
    half = scale // 2
    crash_epoch = max(1, half // 2)
    for i in range(half):
        write_shard(i)
    open(crash_flag, "w").write("arm")
    print(f"run 1: shards 0..{half-1} ({half * n0} docs), crash armed at "
          f"epoch>={crash_epoch}", flush=True)
    crashed, t1 = run_stream("run1")
    assert crashed, "the injected crash did not fire"
    rows_after_crash = lake.read_app_table("corpus_docs").count()
    print(f"  corpus rows after crash: {rows_after_crash}", flush=True)

    # ---- run 2: same checkpoint — replay the crashed epoch -------------
    print("run 2: restart on the same checkpoint (replay crashed epoch)",
          flush=True)
    crashed, t2 = run_stream("run2")
    assert not crashed
    replays = [b for b in batch_log if not b["corpus_committed"]]
    assert replays, "expected >=1 corpus-append no-op on the replayed epoch"
    assert all(b["sketch_committed"] for b in replays), replays

    # ---- run 3: second half of the corpus ------------------------------
    for i in range(half, scale):
        write_shard(i)
    print(f"run 3: shards {half}..{scale-1} appended", flush=True)
    crashed, t3 = run_stream("run3")
    assert not crashed

    # ---- run 4: nothing new — zero batches, counts frozen --------------
    n_corpus = lake.read_app_table("corpus_docs").count()
    n_sketch = lake.read_app_table("kmv_batches").count()
    n_logged = len(batch_log)
    print("run 4: restart with nothing new", flush=True)
    crashed, t4 = run_stream("run4")
    assert not crashed
    assert len(batch_log) == n_logged or all(
        b["rows_in"] == 0 for b in batch_log[n_logged:]
    ), "run 4 processed data it should not have"
    assert lake.read_app_table("corpus_docs").count() == n_corpus
    assert lake.read_app_table("kmv_batches").count() == n_sketch

    # ---- verification from the lake alone -------------------------------
    corpus = lake.read_app_table("corpus_docs")
    n_rows = corpus.count()
    n_distinct_fp = corpus.select("fp").distinct().count()
    assert n_rows == n_distinct_fp, (
        f"exactly-once violated: {n_rows} rows vs {n_distinct_fp} distinct "
        "fingerprints (a replayed epoch double-committed)"
    )
    # merged per-epoch sketches ≡ fresh whole-corpus sketch, hash for hash
    merged = {
        (r["lang"], r["rn"], r["h"])
        for r in kmv_merge(
            lake.read_app_table("kmv_batches"), group_cols=["lang"], k=K
        ).collect()
    }
    whole = {
        (r["lang"], r["rn"], r["h"])
        for r in kmv_build(corpus, "fp", ["lang"], K).collect()
    }
    assert merged == whole, "lake-rollup sketch diverged from whole-corpus sketch"
    ndv = {
        r["lang"]: int(r["ndv_est"])
        for r in kmv_ndv_from_lake(lake, group_cols=["lang"], k=K).collect()
    }
    print(f"\nverified: {n_rows} corpus rows == {n_distinct_fp} distinct fps; "
          f"merged sketch == whole-corpus sketch; NDV from lake: {ndv}",
          flush=True)

    # ---- report ----------------------------------------------------------
    print(f"\ncorpus: {scale * n0} docs ({scale}x {sf_dir}), "
          f"{scale} shards, 1 shard/trigger")
    print(f"runs: run1 {t1:.1f}s (crashed by injection), run2 {t2:.1f}s, "
          f"run3 {t3:.1f}s, run4 {t4:.1f}s (no-op)")
    print("| epoch | rows in | gate kept | corpus new | sketch new | wall s |")
    print("|---|---|---|---|---|---|")
    for b in batch_log:
        print(f"| {b['epoch']} | {b['rows_in']} | {b['gate_kept']} | "
              f"{b['corpus_committed']} | {b['sketch_committed']} | "
              f"{b['wall_s']} |")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
