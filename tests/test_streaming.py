"""Structured Streaming plane: file-source checks stream, windowed
per-domain rate counts, stateful change detection."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from udata_datalake_service_spark.schemas import CHECKS_SCHEMA
from udata_datalake_service_spark.streaming.checks_stream import (
    change_detection_stream,
    domain_rate_windows,
    stream_checks,
)


def _write_checks_batch(spark, checks_df, path):
    # align to the canonical schema (fill missing nullable columns)
    cols = []
    for f in CHECKS_SCHEMA.fields:
        if f.name in checks_df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    checks_df.select(*cols).write.mode("append").parquet(path)


@pytest.mark.slow
def test_change_detection_stream_matches_batch(spark, checks_df, tmp_path):
    src = str(tmp_path / "checks_lake")
    _write_checks_batch(spark, checks_df, src)

    stream = stream_checks(spark, src)
    out = change_detection_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("chg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["check_id"]: r for r in spark.sql("SELECT * FROM chg").collect()}
    assert rows[2]["change_status"] == "HAS_CHANGED"
    assert rows[2]["change_method"] == "last_modified"
    assert rows[3]["change_status"] == "HAS_NOT_CHANGED"
    assert rows[1]["is_first_check"] is True
    assert rows[1]["change_status"] == "NO_GUESS"


@pytest.mark.slow
def test_stream_matches_batch_change_detection(spark, checks_df, tmp_path):
    """The stateful stream and the batch lag-window must compute the SAME
    cascade (both model analysis/resource.py:216-267: compare against the
    previous check row; a missing signal is NO_GUESS for that method)."""
    from udata_datalake_service_spark.plans.change_detection import (
        with_change_detection,
    )

    src = str(tmp_path / "checks_eq")
    # one file → one micro-batch: file-listing order must not interleave a
    # resource's history across triggers
    _write_checks_batch(spark, checks_df.coalesce(1), src)

    q = (
        change_detection_stream(stream_checks(spark, src))
        .writeStream.format("memory")
        .queryName("chg_eq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        r["check_id"]: (r["change_status"], r["change_method"], r["is_first_check"])
        for r in spark.sql("SELECT * FROM chg_eq").collect()
    }
    batch_rows = {
        r["id"]: (r["change_status"], r["change_method"], r["__is_first"])
        for r in with_change_detection(spark.read.parquet(src)).collect()
    }
    assert stream_rows == batch_rows


@pytest.mark.slow
def test_domain_rate_windows(spark, tmp_path):
    src = str(tmp_path / "checks_rate")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (i, f"r{i}", "u", "hot.org", base + dt.timedelta(seconds=10 * i), 200)
        for i in range(6)
    ] + [(99, "r99", "u", "cold.org", base, 429)]
    df = spark.createDataFrame(
        rows, "id long, resource_id string, url string, domain string, created_at timestamp, status int"
    )
    _write_checks_batch(spark, df, src)

    stream = stream_checks(spark, src)
    # update mode: the backoff decision reads the *latest* per-window counts;
    # append mode would withhold rows until the watermark closes each window,
    # which a single availableNow run never reaches.
    out = domain_rate_windows(stream, period_s=360, slide_s=60)
    q = (
        out.writeStream.format("memory")
        .queryName("rates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql(
        "SELECT domain, max(n_checks) AS mx, max(n_429) AS m429 FROM rates GROUP BY domain"
    ).collect()
    got = {r["domain"]: (r["mx"], r["m429"]) for r in res}
    assert got["hot.org"][0] == 6
    assert got["cold.org"][1] == 1


@pytest.mark.slow
def test_stream_rate_windows_match_batch_backoff(spark, tmp_path):
    """E2E parity between the ST2 stream and the batch backoff plan
    (plans/backoff.py): replay a checks file-stream, take the aligned
    sliding window ending at `now`, and the per-domain counts and 429
    flags must equal domain_backoff_table's trailing-window aggregate on
    the same parquet data."""
    from udata_datalake_service_spark.plans.backoff import domain_backoff_table

    src = str(tmp_path / "checks_e2e")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)  # minute-aligned `now`

    def at(**kw):
        return base - dt.timedelta(**kw)

    rows = (
        # hot.org: 8 checks inside the trailing 360 s
        [(i, f"h{i}", "u", "hot.org", at(seconds=30 * i + 5), 200)
         for i in range(8)]
        # warm.org: 3 recent + 2 outside the window but inside cool-off
        + [(20 + i, f"w{i}", "u", "warm.org", at(seconds=60 * i + 10), 200)
           for i in range(3)]
        + [(30, "w8", "u", "warm.org", at(minutes=30), 200),
           (31, "w9", "u", "warm.org", at(minutes=25), 200)]
        # err.org: one old 429, nothing recent
        + [(40, "e1", "u", "err.org", at(minutes=20), 429)]
    )
    df = spark.createDataFrame(
        rows,
        "id long, resource_id string, url string, domain string, "
        "created_at timestamp, status int",
    )
    _write_checks_batch(spark, df, src)

    q = (
        domain_rate_windows(stream_checks(spark, src), period_s=360, slide_s=60)
        .writeStream.format("memory")
        .queryName("rates_e2e")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    win = spark.sql(
        "SELECT domain, n_checks FROM rates_e2e WHERE window.end = timestamp'2024-01-01 10:00:00'"
    ).collect()
    stream_recent = {r["domain"]: r["n_checks"] for r in win}
    saw = spark.sql(
        "SELECT domain, max(n_429) AS m FROM rates_e2e GROUP BY domain"
    ).collect()
    stream_429 = {r["domain"]: r["m"] > 0 for r in saw}

    batch = {
        r["domain"]: (r["recent_checks"], r["saw_429"])
        for r in domain_backoff_table(
            spark.read.parquet(src), now=F.lit(base), nb_req=5
        ).collect()
    }
    assert set(batch) == {"hot.org", "warm.org", "err.org"}
    for domain, (recent, saw_429) in batch.items():
        assert stream_recent.get(domain, 0) == recent, domain
        assert stream_429.get(domain, False) == saw_429, domain


@pytest.mark.slow
def test_streaming_session_windows_match_batch(spark, sf_dir, tmp_path):
    """The sessionization operator's streaming leg: the SAME
    session_stats_native plan over readStream (watermark + availableNow)
    must emit the sessions the batch run emits — the operator's
    batch-attested semantics carry to a streaming deployment unchanged."""
    from udata_datalake_service_spark.operators.sessions import session_stats_native

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_lake")
    ev.write.mode("append").parquet(src)

    batch = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in session_stats_native(ev, ["user_id"], "ts", 8 * 3600).collect()
    }

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    out = session_stats_native(stream, ["user_id"], "ts", 8 * 3600)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    }
    assert got == batch and len(got) > 20


@pytest.mark.slow
def test_streaming_exact_dedup_crosses_batches(spark, tmp_path):
    """Incremental exact dedup: a verbatim re-arrival in a LATER micro-batch
    is dropped by carried state, and the surviving fingerprint set equals
    the batch exact_dedup's (first-arrival ≡ min-id under id-ordered
    arrival)."""
    from udata_datalake_service_spark.llm.text import fingerprint as fp_expr
    from udata_datalake_service_spark.streaming.dedup_stream import (
        exact_dedup_stream,
        stream_documents,
    )

    src = str(tmp_path / "docs_lake")
    ck = str(tmp_path / "ck")
    mk = lambda i, t: (i, t, "en", "s", len(t))  # noqa: E731
    f1 = [mk(1, "alpha beta gamma"), mk(2, "delta epsilon zeta"), mk(3, "alpha beta gamma!")]
    f2 = [mk(10, "Alpha beta GAMMA"), mk(11, "fresh new content"), mk(12, "delta epsilon zeta")]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    # two files, forced arrival order via maxFilesPerTrigger=1 + name order
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(src + "/b=0")
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(src + "/b=1")

    out = exact_dedup_stream(stream_documents(spark, src + "/b=*"))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, fp FROM dedup_stream").collect()

    # 1,3 share a fingerprint (punct-invariant); 10 re-arrives 1's content,
    # 12 re-arrives 2's — cross-batch state must drop both re-arrivals
    ids = sorted(r["doc_id"] for r in got)
    assert 11 in ids and 2 in ids
    assert 10 not in ids and 12 not in ids
    fps = [r["fp"] for r in got]
    assert len(fps) == len(set(fps))

    batch = spark.createDataFrame(f1 + f2, schema)
    from udata_datalake_service_spark.llm.dedup import exact_dedup

    batch_fps = {
        r["f"] for r in exact_dedup(batch).select(fp_expr(F.col("text")).alias("f")).collect()
    }
    assert set(fps) == batch_fps


@pytest.mark.slow
def test_streaming_dedup_watermarked_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark leg: still drops the in-horizon
    verbatim duplicate (smoke — horizon semantics are Spark's own)."""
    from udata_datalake_service_spark.streaming.dedup_stream import (
        exact_dedup_stream_watermarked,
    )

    src = str(tmp_path / "docs_ts")
    ck = str(tmp_path / "ck2")
    rows = [
        (1, "same old text", "2024-01-01 10:00:00"),
        (2, "same old text", "2024-01-01 10:30:00"),   # inside horizon → dropped
        (3, "different words entirely", "2024-01-01 10:40:00"),
    ]
    schema = "doc_id long, text string, ts string"
    spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(src)
    )
    out = exact_dedup_stream_watermarked(stream, "ts", horizon="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_wm").collect())
    assert 3 in ids
    assert len([i for i in ids if i in (1, 2)]) == 1


@pytest.mark.slow
def test_chunking_streams_unchanged(spark, tmp_path):
    """chunk_documents is map-only, so the SAME plan runs over readStream
    with no watermark/state — batch≡stream output, the property that lets
    the chunking step sit in the ingest stream."""
    from udata_datalake_service_spark.llm.packing import chunk_documents
    from udata_datalake_service_spark.streaming.dedup_stream import (
        DOCUMENTS_SCHEMA,
        stream_documents,
    )

    src = str(tmp_path / "docs")
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(3 + 7 * (i % 5))), "en", "s", 0)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    df.coalesce(2).write.parquet(src)

    batch = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(df, size=8, overlap=2).collect()
    }
    out = chunk_documents(stream_documents(spark, src, max_files_per_trigger=1), size=8, overlap=2)
    q = (
        out.writeStream.format("memory")
        .queryName("chunks_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in spark.sql("SELECT * FROM chunks_stream").collect()
    }
    assert got == batch and len(got) > 40


def test_gopher_quality_streams_unchanged(spark, tmp_path):
    """gopher_quality is map-only (expressions + mapInPandas), so the SAME
    plan runs under readStream with no stateful operators: replaying the
    corpus through a file stream must reproduce the batch rule table."""
    from udata_datalake_service_spark.llm.gopher import gopher_quality

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and that cat did have fun with it"),
            (2, "alpha beta gamma\nalpha beta gamma\n• bullet one\nend it..."),
            (3, "spam ham spam ham spam ham spam ham"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    batch = {r["doc_id"]: r.asDict() for r in gopher_quality(docs).collect()}

    stream_in = spark.readStream.schema(docs.schema).parquet(src)
    out = gopher_quality(stream_in)
    q = (
        out.writeStream.format("memory")
        .queryName("gopher_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r.asDict()
        for r in spark.sql("SELECT * FROM gopher_stream").collect()
    }
    assert got == batch


def test_streaming_curation_pipeline_composes(spark, tmp_path):
    """End-to-end streaming curation: file stream (1 file per micro-batch)
    → Gopher gate (map-only) → incremental exact dedup (stateful
    dropDuplicates on the canonical fingerprint) → sink. A passing doc
    re-sent verbatim in a LATER micro-batch must be dropped by carried
    state; every survivor passes the gate."""
    from udata_datalake_service_spark.llm.gopher import gopher_quality
    from udata_datalake_service_spark.llm.text import fingerprint

    good = (
        "the quick brown fox jumps over that lazy dog and dogs have played "
        "with plenty of patience watching every single visitor today "
        + " ".join(f"uniq{i:02d} tokn{i:02d}" for i in range(20))
    )
    src = tmp_path / "stream_src"
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, good), (2, "spam ham spam ham spam ham")], schema
    )
    b2 = spark.createDataFrame(
        [(10, good), (11, good.replace("quick", "rapid"))], schema
    )
    b1.coalesce(1).write.parquet(str(src / "b=0"))
    b2.coalesce(1).write.parquet(str(src / "b=1"))

    stream_in = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b=*"))
    )
    passing = gopher_quality(stream_in).filter(F.col("gopher_pass")).select("doc_id")
    survivors = stream_in.join(passing, on="doc_id").withColumn(
        "fp", fingerprint(F.col("text"))
    ).dropDuplicates(["fp"])
    q = (
        survivors.writeStream.format("memory")
        .queryName("curate_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM curate_stream").collect()}
    # 2 fails the gate; 10 is a cross-batch verbatim re-send of 1; 11 is a
    # fresh passing variant
    assert got == {1, 11}


def test_transitions_stream_matches_batch_matrix(spark, tmp_path):
    """The streaming adjacency emitter ≡ the batch lag window: replaying
    events over two time-ordered micro-batches and aggregating the
    adjacencies must give exactly `event_transitions`' counts — including
    a cross-batch adjacency carried through state."""
    from udata_datalake_service_spark.operators.markov import event_transitions
    from udata_datalake_service_spark.streaming.transitions_stream import (
        transitions_stream,
    )

    schema = "event_id long, user_id long, ts timestamp, event_type string"
    mk = lambda i, u, m, e: (i, u, f"2024-01-01 00:{m:02d}:00", e)  # noqa: E731
    f1 = [mk(1, 1, 0, "a"), mk(2, 1, 1, "b"), mk(3, 2, 0, "x")]
    f2 = [mk(4, 1, 2, "a"), mk(5, 2, 3, "y"), mk(6, 2, 4, "x")]
    src = str(tmp_path / "events_src")
    to_df = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    to_df(f1).coalesce(1).write.parquet(src + "/b=0")
    to_df(f2).coalesce(1).write.parquet(src + "/b=1")

    stream_in = (
        spark.readStream.schema(to_df(f1).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b=*")
    )
    q = (
        transitions_stream(stream_in)
        .writeStream.format("memory")
        .queryName("adj_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_adj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["prev_event"], r["next_event"]): r["n"]
        for r in spark.sql(
            "SELECT prev_event, next_event, COUNT(*) AS n FROM adj_stream "
            "GROUP BY 1, 2"
        ).collect()
    }
    batch = {
        (r["prev_event"], r["next_event"]): r["n"]
        for r in event_transitions(to_df(f1 + f2)).collect()
    }
    # b->a (user 1) crosses the micro-batch boundary via carried state
    assert got == batch and ("b", "a") in got


def test_streaming_corpus_ingest_exactly_once(spark, tmp_path):
    """The foreachBatch + ledger sink composition: drain a shard dir into
    the corpus table, restart from the same checkpoint (no re-emission),
    add a shard with overlapping content (state store drops the dup),
    and replay one epoch manually (ledger no-ops it)."""
    from udata_datalake_service_spark.llm.text import fingerprint as _fp
    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.streaming.dedup_stream import DOCUMENTS_SCHEMA
    from udata_datalake_service_spark.streaming.ingest_stream import (
        corpus_ingest_stream,
    )

    src = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    lake = Lake(spark, str(tmp_path / "lake"))

    def shard(rows, name):
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    shard([(1, "alpha beta", "en", "web", 10), (2, "gamma delta", "en", "web", 11)], "s1")
    q = corpus_ingest_stream(spark, src, lake, ckpt)
    q.awaitTermination(120)
    assert lake.read_log_table("corpus_docs").count() == 2

    # restart on the same checkpoint with nothing new: no duplicates
    q = corpus_ingest_stream(spark, src, lake, ckpt)
    q.awaitTermination(120)
    assert lake.read_log_table("corpus_docs").count() == 2

    # overlapping shard: state store drops the re-crawled doc 1 content
    shard([(3, "alpha  BETA!", "en", "web", 12), (4, "epsilon zeta", "en", "web", 13)], "s2")
    q = corpus_ingest_stream(spark, src, lake, ckpt)
    q.awaitTermination(120)
    got = lake.read_log_table("corpus_docs")
    assert got.count() == 3
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {1, 2, 4}

    # a replayed epoch (same checkpoint-derived ledger key) must no-op
    import hashlib as _hashlib

    prefix = "stream-ingest-" + _hashlib.md5(ckpt.encode()).hexdigest()[:8]
    replay = spark.createDataFrame(
        [(9, "nu xi", "en", "web", 9)], DOCUMENTS_SCHEMA
    ).withColumn("fp", _fp(F.col("text")))
    assert lake.append_log_table_exactly_once(replay, "corpus_docs", f"{prefix}-0") is False
    assert lake.read_log_table("corpus_docs").count() == 3


def test_streaming_kmv_sketch_rollup_matches_whole_build(spark, tmp_path):
    """Streaming statistics without history rescans: per-epoch KMV
    sketches appended exactly-once; the lake rollup is hash-for-hash the
    whole-data sketch (min-k(∪ min-k) = min-k(∪)); duplicates across
    batches change NOTHING (KMV is multiplicity-blind, so the stream
    needs no dedup state); a restart and a manual epoch replay both
    no-op."""
    from udata_datalake_service_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
    )
    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.streaming.dedup_stream import DOCUMENTS_SCHEMA
    from udata_datalake_service_spark.streaming.sketch_stream import (
        kmv_ndv_from_lake,
        kmv_sketch_stream,
    )

    src = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    lake = Lake(spark, str(tmp_path / "lake"))
    k = 8

    def shard(rows):
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    shard([(i, f"t{i}", "en" if i % 2 else "fr", "web", 5) for i in range(30)])
    shard([(i, f"t{i}", "en" if i % 2 else "fr", "web", 5) for i in range(20, 50)])

    q = kmv_sketch_stream(spark, src, lake, ckpt, col="doc_id", k=k)
    q.awaitTermination(120)
    # two epochs (maxFilesPerTrigger=1) -> per-group sketch rows from 2 batches
    batches = lake.read_app_table("kmv_batches")
    assert batches.select("batch_epoch").distinct().count() == 2

    # rollup from the lake == whole-data build, hash for hash, despite
    # the 20..29 overlap arriving twice
    whole_rows = [(i, "en" if i % 2 else "fr") for i in range(50)]
    whole = spark.createDataFrame(whole_rows, "doc_id long, lang string")
    want = {
        (r["lang"], r["rn"], r["h"])
        for r in kmv_build(whole, "doc_id", ["lang"], k).collect()
    }
    from udata_datalake_service_spark.operators.sketch import kmv_merge

    got = {
        (r["lang"], r["rn"], r["h"])
        for r in kmv_merge(batches, group_cols=["lang"], k=k).collect()
    }
    assert got == want
    est = {r["lang"]: r for r in kmv_ndv_from_lake(lake, k=k, group_cols=["lang"]).collect()}
    ref = {
        r["lang"]: r
        for r in kmv_estimate(
            kmv_build(whole, "doc_id", ["lang"], k), ["lang"], k
        ).collect()
    }
    for lang in ("en", "fr"):
        assert est[lang]["ndv_est"] == ref[lang]["ndv_est"]

    # restart on the same checkpoint with nothing new: no new epochs
    q = kmv_sketch_stream(spark, src, lake, ckpt, col="doc_id", k=k)
    q.awaitTermination(120)
    assert lake.read_app_table("kmv_batches").count() == batches.count()

    # manual replay of epoch 0 (same checkpoint-derived ledger key): no-op
    import hashlib as _h

    prefix = "stream-kmv-" + _h.md5(ckpt.encode()).hexdigest()[:8]
    replay = kmv_build(whole, "doc_id", ["lang"], k).withColumn(
        "batch_epoch", F.lit(0)
    )
    assert (
        lake.append_app_table_exactly_once(replay, "kmv_batches", f"{prefix}-0")
        is False
    )

    # compaction folds every epoch into one k-per-group sketch and the
    # rollup answer is bit-identical before/after (min-k merge law)
    from udata_datalake_service_spark.streaming.sketch_stream import (
        kmv_compact_lake_sketches,
    )

    stats = kmv_compact_lake_sketches(lake, k=k, group_cols=["lang"])
    assert stats["rows_after"] <= stats["rows_before"]
    got_after = {
        (r["lang"], r["rn"], r["h"])
        for r in kmv_merge(
            lake.read_app_table("kmv_batches"), group_cols=["lang"], k=k
        ).collect()
    }
    assert got_after == want
    assert (
        lake.read_app_table("kmv_batches")
        .select("batch_epoch")
        .distinct()
        .count()
        == 1
    )

    # ADVICE r10: compaction CARRIES the exactly-once ledger — a crash-
    # replayed pre-compaction epoch must keep no-opping (the data
    # survived the merge, so the id must stay committed), and the
    # compacted table must not grow duplicate batch_epoch rows
    n_compacted = lake.read_app_table("kmv_batches").count()
    assert (
        lake.append_app_table_exactly_once(replay, "kmv_batches", f"{prefix}-0")
        is False
    )
    assert lake.read_app_table("kmv_batches").count() == n_compacted


@pytest.mark.slow
def test_watermark_late_data_contract(spark, tmp_path):
    """The event-time late-data contract for the ST2 rate windows
    (VERDICT r5 #8): two checkpointed availableNow runs — run 1 advances
    the watermark (max event 10:05:10 − 120 s = 10:03:10), run 2 delivers
    two LATE arrivals after restart. Contract:

    * late-but-within-watermark (10:04:00): accepted — every open window
      containing it matches a trailing-window batch recompute exactly;
    * beyond-watermark (09:57:05, all of whose windows had closed):
      dropped — the closed [09:57, 10:03) window keeps its run-1 count,
      diverging from the batch recompute by EXACTLY the dropped row.

    The watermark survives the restart via the checkpoint, which is what
    makes the drop deterministic rather than racy."""
    from udata_datalake_service_spark.plans.backoff import domain_backoff_table

    src = str(tmp_path / "checks_late")
    ck = str(tmp_path / "ck_late")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    schema = (
        "id long, resource_id string, url string, domain string, "
        "created_at timestamp, status int"
    )

    emitted: list = []

    def run():
        # the memory sink cannot recover from a checkpoint; foreachBatch
        # can, and in local mode it collects on the driver
        q = (
            domain_rate_windows(
                stream_checks(spark, src), period_s=360, slide_s=60, watermark_s=120
            )
            .writeStream.foreachBatch(
                lambda df, _eid: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    on_time = [
        (i, f"a{i}", "u", "hot.org", base + dt.timedelta(seconds=10 + 60 * i), 200)
        for i in range(6)  # 10:00:10 .. 10:05:10
    ]
    _write_checks_batch(spark, spark.createDataFrame(on_time, schema), src)
    run()

    late = [
        # within watermark (10:03:10): accepted
        (20, "l1", "u", "hot.org", base + dt.timedelta(seconds=240), 200),
        # beyond watermark: every window it belongs to ended <= 10:03:00
        (21, "l2", "u", "hot.org", base - dt.timedelta(seconds=175), 200),
    ]
    _write_checks_batch(spark, spark.createDataFrame(late, schema), src)
    run()

    final: dict = {}
    for r in emitted:  # update mode: later emissions supersede earlier
        final[(r["window"]["end"], r["domain"])] = max(
            r["n_checks"], final.get((r["window"]["end"], r["domain"]), 0)
        )

    def batch_recent(now):
        rows = domain_backoff_table(
            spark.read.parquet(src).filter(F.col("created_at") < F.lit(now)),
            now=F.lit(now),
        ).collect()
        return {r["domain"]: r["recent_checks"] for r in rows}

    # within the watermark: stream == batch (6 on-time + the accepted late)
    t_open = base + dt.timedelta(seconds=360)
    assert final[(t_open, "hot.org")] == 7
    assert batch_recent(t_open)["hot.org"] == 7
    # beyond it: the closed window froze at its run-1 count; the batch
    # recompute (which always sees late rows) counts one more
    t_closed = base + dt.timedelta(seconds=180)
    assert final[(t_closed, "hot.org")] == 3
    assert batch_recent(t_closed)["hot.org"] == 4


@pytest.mark.slow
def test_countmin_sketch_streams_and_merges_with_batch(spark, tmp_path):
    """The count-min build is a plain (row, bucket) aggregate, so it runs
    UNDER THE STREAMING ENGINE unchanged (groupBy + sum in complete
    mode), and — the mergeability law — the streamed sketch equals the
    batch sketch over the same rows, bucket for bucket."""
    from pyspark.sql import functions as F

    from udata_datalake_service_spark.operators.sketch import countmin_build

    src = str(tmp_path / "toks")
    rows = [(i, f"w{i % 11}") for i in range(300)]
    batch = spark.createDataFrame(rows, "i long, t string")
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    sk_stream = countmin_build(stream, "t", depth=3, width=8)
    q = (
        sk_stream.writeStream.format("memory")
        .queryName("cms")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["row"], r["bucket"]): r["c"]
        for r in spark.sql("SELECT * FROM cms").collect()
    }
    want = {
        (r["row"], r["bucket"]): r["c"]
        for r in countmin_build(batch, "t", depth=3, width=8).collect()
    }
    assert got == want


@pytest.mark.slow
def test_neardup_stream_verified_dedup_across_epochs(spark, tmp_path):
    """Streaming VERIFIED near-dup ingest (streaming/neardup_stream.py):

    * shard 0 — 30 distinct docs (disjoint vocab)       -> 30 survive
    * shard 1 — 10 near-dup copies of shard-0 docs (one word changed in
      thirty, NEW ids), 10 fresh distinct docs, plus an in-batch
      near-dup pair (min id wins)                        -> 11 survive
    * shard 2 — verbatim copy of shard 0: the exact-fingerprint state
      store empties the batch before the sink            -> 0 survive

    Every drop is estimate-VERIFIED (>= 0.5), never a raw band
    collision; the survivor ID SET is asserted exactly. The near tier's
    one-in-30 edit keeps true Jaccard ≈ 0.87; under the r13 xxh64
    default's fixed draw every near pair matches ≥ 2 of 4 bands and
    estimates ≥ 0.75 — clear margins on both cuts (the original
    one-in-12 / J ≈ 0.69 fixture sat on the knife edge: the md5→xxh64
    switch re-rolled the draw and two near docs escaped banding
    entirely). Restart with nothing new is a no-op, and all three lake
    ledgers (docs / band index / sigs) no-op a manual epoch replay."""
    import hashlib as _h

    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.streaming.dedup_stream import DOCUMENTS_SCHEMA
    from udata_datalake_service_spark.streaming.neardup_stream import (
        near_dup_ingest_stream,
    )

    src = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    lake = Lake(spark, str(tmp_path / "lake"))

    def words(i, alt=False):
        w = [f"tok{i}x{j}" for j in range(30)]
        if alt:
            w[11] = f"alt{i}"  # one word changed in 30 -> J ~= 0.87
        return " ".join(w)

    def shard(rows, name):
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"stage_{name}"))
        import os as _os
        import shutil as _sh

        stage = str(tmp_path / f"stage_{name}")
        part = next(p for p in _os.listdir(stage) if p.endswith(".parquet"))
        _os.makedirs(src, exist_ok=True)
        _os.replace(f"{stage}/{part}", f"{src}/{name}.parquet")
        _sh.rmtree(stage)

    base = [(i, words(i), "en", "web", 60) for i in range(30)]
    shard(base, "s0")
    near = [(100 + i, words(i, alt=True), "en", "web", 60) for i in range(10)]
    fresh = [(110 + i, words(200 + i), "en", "web", 60) for i in range(10)]
    pair = [(150, words(300), "en", "web", 60), (151, words(300, alt=True), "en", "web", 60)]
    shard(near + fresh + pair, "s1")
    shard([(500 + i, words(i), "en", "web", 60) for i in range(30)], "s2")

    q = near_dup_ingest_stream(spark, src, lake, ckpt)
    q.awaitTermination(300)

    got = {r["doc_id"] for r in lake.read_log_table("corpus_docs").collect()}
    want = {i for i in range(30)} | {110 + i for i in range(10)} | {150}
    assert got == want, (sorted(got - want), sorted(want - got))

    # three epoch-stamped state tables, queryable like any lake table
    idx = lake.read_log_table("lsh_band_index")
    sg = lake.read_log_table("minhash_sigs")
    assert {r["id"] for r in sg.select("id").distinct().collect()} == want
    assert set(idx.columns) >= {"id", "band", "bkey", "batch_epoch"}

    # restart with nothing new: no growth anywhere
    q = near_dup_ingest_stream(spark, src, lake, ckpt)
    q.awaitTermination(300)
    assert {r["doc_id"] for r in lake.read_log_table("corpus_docs").collect()} == want
    assert lake.read_log_table("minhash_sigs").count() == len(want)

    # manual replay of an already-committed epoch: every ledger no-ops
    prefix = "stream-neardup-" + _h.md5(ckpt.encode()).hexdigest()[:8]
    some = lake.read_log_table("corpus_docs").limit(1)
    for t, tag in (("corpus_docs", "docs"), ("lsh_band_index", "index"),
                   ("minhash_sigs", "sigs")):
        assert (
            lake.append_log_table_exactly_once(some, t, f"{prefix}-{tag}-0")
            is False
        ), t


@pytest.mark.slow
def test_neardup_stream_crash_replay_heals(spark, tmp_path):
    """The multi-table-sink determinism contract: a torn commit that
    landed ONLY the band-index append of an epoch (crash before
    docs/sigs) must heal on replay — the probe reads index rows with
    batch_epoch < current epoch only, so the epoch's own
    partially-committed rows can never make its documents collide with
    themselves and self-drop.

    Simulated by PRE-committing the exact index rows (same ledger id)
    the sink will produce for the next epoch, then running the stream:
    the index append no-ops, docs/sigs commit, and every document of
    the epoch survives."""
    import hashlib as _h

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.llm.dedup import (
        lsh_band_table,
        minhash_signatures,
    )
    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.streaming.dedup_stream import DOCUMENTS_SCHEMA
    from udata_datalake_service_spark.streaming.neardup_stream import (
        near_dup_ingest_stream,
    )

    src = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    lake = Lake(spark, str(tmp_path / "lake"))
    prefix = "stream-neardup-" + _h.md5(ckpt.encode()).hexdigest()[:8]

    def words(i):
        return " ".join(f"w{i}q{j}" for j in range(12))

    def shard(rows, name):
        import os as _os
        import shutil as _sh

        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(p for p in _os.listdir(stage) if p.endswith(".parquet"))
        _os.makedirs(src, exist_ok=True)
        _os.replace(f"{stage}/{part}", f"{src}/{name}.parquet")
        _sh.rmtree(stage)

    shard([(i, words(i), "en", "web", 60) for i in range(10)], "s0")
    q = near_dup_ingest_stream(spark, src, lake, ckpt)
    q.awaitTermination(300)
    assert lake.read_log_table("corpus_docs").count() == 10

    # epoch 1's docs: pre-commit their index rows under the sink's OWN
    # ledger id for epoch 1 — the torn-commit state a crash between the
    # appends leaves behind
    rows2 = [(100 + i, words(50 + i), "en", "web", 60) for i in range(10)]
    df2 = spark.createDataFrame(rows2, DOCUMENTS_SCHEMA)
    # the pre-committed torn rows must be the ones the sink itself would
    # produce: same hash family as the stream default (xxh64)
    sigs2 = minhash_signatures(df2, num_hashes=8, k=2, hash_family="xxh64")
    band2 = lsh_band_table(sigs2, 4, 2).withColumn("batch_epoch", F.lit(1))
    assert lake.append_log_table_exactly_once(
        band2, "lsh_band_index", f"{prefix}-index-1"
    ) is True

    shard(rows2, "s1")
    q = near_dup_ingest_stream(spark, src, lake, ckpt)
    q.awaitTermination(300)

    got = {r["doc_id"] for r in lake.read_log_table("corpus_docs").collect()}
    assert got == set(range(10)) | {100 + i for i in range(10)}, sorted(got)
    # the torn index append was healed by the ledger (no duplicate rows)
    idx = lake.read_log_table("lsh_band_index").filter(F.col("batch_epoch") == 1)
    assert idx.count() == idx.distinct().count()
    # and sigs for epoch 1 are present (the append that "crashed" ran on replay)
    assert (
        lake.read_log_table("minhash_sigs").filter(F.col("batch_epoch") == 1).count()
        == 10
    )


def test_streaming_bm25_index_matches_whole_corpus(spark, tmp_path):
    """Streaming retrieval without history re-tokenization: per-epoch raw
    postings + mergeable stats appended exactly-once; probing the lake
    index reproduces the whole-corpus BM25 ranking EXACTLY (the append
    law end-to-end through the real streaming engine); a restart, a
    manual epoch replay, and a torn two-table commit all heal/no-op;
    file compaction leaves the ranking bit-identical (row-preserving).
    Unlike the KMV stream, postings are NOT multiplicity-blind — doc
    identity is owned upstream (the ingest/near-dup streams), so the
    shards here are disjoint by construction."""
    from udata_datalake_service_spark.llm.retrieval import (
        bm25_postings,
        bm25_stats,
        bm25_topk,
    )
    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.streaming.dedup_stream import DOCUMENTS_SCHEMA
    from udata_datalake_service_spark.streaming.retrieval_stream import (
        bm25_from_lake,
        bm25_index_stream,
    )

    src = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    lake = Lake(spark, str(tmp_path / "lake"))

    def shard(lo, hi):
        rows = [
            (i, f"alpha beta w{i % 7} w{i % 11} t{i}", "en", "web", 5)
            for i in range(lo, hi)
        ]
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    shard(0, 40)
    shard(40, 80)

    q = bm25_index_stream(spark, src, lake, ckpt)
    q.awaitTermination(120)
    postings = lake.read_log_table("bm25_postings")
    assert postings.select("batch_epoch").distinct().count() == 2
    assert lake.read_app_table("bm25_stats").count() == 2

    whole = spark.createDataFrame(
        [
            (i, f"alpha beta w{i % 7} w{i % 11} t{i}", "en", "web", 5)
            for i in range(80)
        ],
        DOCUMENTS_SCHEMA,
    )
    queries = spark.createDataFrame(
        [(1000, "w3 w5 alpha"), (1001, "t17 beta")], "query_id long, text string"
    )
    from udata_datalake_service_spark.caching import settle

    want = sorted(map(tuple, settle(bm25_topk(whole, queries, k=5)).collect()))
    got = sorted(map(tuple, bm25_from_lake(lake, queries, k=5).collect()))
    assert got == want

    # restart on the same checkpoint with nothing new: no new epochs
    q = bm25_index_stream(spark, src, lake, ckpt)
    q.awaitTermination(120)
    assert lake.read_log_table("bm25_postings").count() == postings.count()

    # manual replay of epoch 0 (same checkpoint-derived ledger keys): no-op
    import hashlib as _h

    prefix = "stream-bm25-" + _h.md5(ckpt.encode()).hexdigest()[:8]
    replay_p = bm25_postings(whole).withColumn("batch_epoch", F.lit(0))
    assert (
        lake.append_log_table_exactly_once(replay_p, "bm25_postings", f"{prefix}-0")
        is False
    )

    # torn two-table commit heals: pre-commit epoch 99's POSTINGS only
    # (the crash-between-appends state), then re-deliver both — the
    # postings append no-ops, the stats row lands, and the lake index
    # equals the batch build over the now-81-doc corpus
    extra = spark.createDataFrame(
        [(999, "alpha w3 w5 unique999", "en", "web", 5)], DOCUMENTS_SCHEMA
    )
    p99 = bm25_postings(extra).withColumn("batch_epoch", F.lit(99))
    st99 = bm25_stats(extra).withColumn("batch_epoch", F.lit(99))
    assert (
        lake.append_log_table_exactly_once(p99, "bm25_postings", f"{prefix}-99")
        is True
    )
    # replay of the full epoch (as the stream would after the crash)
    assert (
        lake.append_log_table_exactly_once(p99, "bm25_postings", f"{prefix}-99")
        is False
    )
    assert (
        lake.append_app_table_exactly_once(st99, "bm25_stats", f"{prefix}-99")
        is True
    )
    whole81 = whole.unionByName(extra)
    want81 = sorted(map(tuple, settle(bm25_topk(whole81, queries, k=5)).collect()))
    got81 = sorted(map(tuple, bm25_from_lake(lake, queries, k=5).collect()))
    assert got81 == want81

    # compaction is row-preserving: the ranking is bit-identical after
    lake.compact_log_table("bm25_postings")
    got_c = sorted(map(tuple, bm25_from_lake(lake, queries, k=5).collect()))
    assert got_c == want81


def test_bm25_recrawl_dedup_at_compaction_and_probe(spark, tmp_path):
    """VERDICT r12 task 5: the unique-doc contract's escape hatch is
    enforced code, not a docstring. A raw-crawl feed re-ingests docs in
    later epochs; the naive lake probe then drifts (df/n_docs/tf double-
    counted — asserted, so this test bites). `compact_bm25_index` folds
    postings to each doc's latest epoch and rewrites the stats table to
    the exact post-dedup counters, after which a PLAIN probe matches a
    single-ingest index of the latest doc versions; replays still no-op
    (ledger carried + markers carried). `bm25_from_lake(
    dedup_recrawls=True)` gives the same exactness WITHOUT compaction,
    including for re-crawls landed after the last fold."""
    from udata_datalake_service_spark.caching import settle
    from udata_datalake_service_spark.llm.retrieval import bm25_topk
    from udata_datalake_service_spark.sinks.lake import Lake
    from udata_datalake_service_spark.streaming.dedup_stream import DOCUMENTS_SCHEMA
    from udata_datalake_service_spark.streaming.retrieval_stream import (
        bm25_from_lake,
        bm25_index_stream,
        compact_bm25_index,
    )

    src = str(tmp_path / "crawl")
    ckpt = str(tmp_path / "ckpt")
    lake = Lake(spark, str(tmp_path / "lake"))

    def shard(rows):
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    v1 = [(i, f"alpha w{i % 5} old{i} stale", "en", "web", 5) for i in range(20)]
    shard(v1)
    q = bm25_index_stream(spark, src, lake, ckpt)
    q.awaitTermination(120)

    # re-crawl: docs 0-9 change text (term 'stale' disappears, 'fresh'
    # appears), docs 20-24 are brand new
    v2 = [(i, f"alpha w{i % 5} new{i} fresh", "en", "web", 5) for i in range(10)]
    v2 += [(i, f"alpha w{i % 5} old{i} stale", "en", "web", 5) for i in range(20, 25)]
    shard(v2)
    q = bm25_index_stream(spark, src, lake, ckpt)
    q.awaitTermination(120)

    latest = {r[0]: r for r in v1}
    latest.update({r[0]: r for r in v2})
    single_ingest = spark.createDataFrame(
        sorted(latest.values()), DOCUMENTS_SCHEMA
    )
    queries = spark.createDataFrame(
        [(1000, "alpha w3"), (1001, "stale old7"), (1002, "fresh new3")],
        "query_id long, text string",
    )
    want = sorted(map(tuple, settle(bm25_topk(single_ingest, queries, k=5)).collect()))

    # the naive probe DRIFTS on a re-crawled feed — prove the hazard is real
    naive = sorted(map(tuple, bm25_from_lake(lake, queries, k=5).collect()))
    assert naive != want

    # probe-time fold: exact without any compaction
    got_probe = sorted(
        map(tuple, bm25_from_lake(lake, queries, k=5, dedup_recrawls=True).collect())
    )
    assert got_probe == want

    # compact-time fold: a PLAIN probe is exact afterwards
    compact_bm25_index(lake)
    got_plain = sorted(map(tuple, bm25_from_lake(lake, queries, k=5).collect()))
    assert got_plain == want
    # stats were rewritten to the post-dedup counters
    stats = lake.read_app_table("bm25_stats").collect()
    assert len(stats) == 1 and stats[0]["n_docs"] == 25

    # replays still no-op: restart on the same checkpoint, nothing new
    q = bm25_index_stream(spark, src, lake, ckpt)
    q.awaitTermination(120)
    assert sorted(map(tuple, bm25_from_lake(lake, queries, k=5).collect())) == want

    # idempotent: folding again changes nothing
    compact_bm25_index(lake)
    assert sorted(map(tuple, bm25_from_lake(lake, queries, k=5).collect())) == want
