"""End-to-end curation soak (VERDICT r9 #2).

One run, every plane the repo built, CHAINED — the actual 100 TB
composition instead of per-operator probes:

  multi-file WARC crawl (32 per-record-gzip files, synthesized IN
  PARALLEL by Spark so the inflate leg runs at real parallelism, closing
  the parallelism-2 artifact in SCALE64.md's r9 attribution)
    → warc ingest (binaryFile → record split → envelope parse →
      html_to_text)
    → gopher quality gate
    → dedup (exact fingerprint + capped MinHash/LSH near-dup)
    → retrieval-gated decontam (VERDICT r11 task 1): BM25 top-20 per
      eval item over the post-dedup corpus ∩ shared-k-gram evidence —
      the `rt_decontam` review queue, executed against the composed
      corpus and ACTED on (queue docs dropped)
    → k-gram decontamination against the same eval set (the blunt
      verbatim pass over whatever the gated leg didn't already drop)
    → hard-negatives export (BM25-close, Jaccard-verified-not-dup)
      for the eval set from the final clean corpus
    → stratified mixing
    → write_training_shards against the S3ObjectStore backend (moto —
      data bytes live ONLY server-side), manifests verified FROM the
      bucket.

Corpus fixture (VERDICT r11 task 2): by default `zipf` — the
natural-statistics generator (`llm/synthtext.zipf_documents`: ~10⁴
Zipf-Mandelbrot vocabulary with the real English function-word head,
lognormal heavy-tailed doc lengths, ≈10 % honestly under Gopher's
50-word floor), 5 000 base docs scaled ×N in three duplication tiers:
every 8th copy keeps the original text (real exact-dup families), one
tier salts only long words (near-dup families), the rest salt most
words (distinct docs). The base-doc texts double as the eval set, so
tier-0 copies are PLANTED verbatim contamination the retrieval leg
must catch. `legacy` re-runs the old documents-table fixture (31-token
vocab + stopword openers) for round-over-round comparison.

Prints a per-phase markdown table (phase, rows in → out, wall s);
paste into SOAK.md.

Usage: python tools/soak_curation.py [sf_dir] [scale] [zipf|legacy]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    fixture = sys.argv[3] if len(sys.argv) > 3 else "zipf"
    assert fixture in ("zipf", "legacy"), fixture

    import os
    import shutil

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.session import get_spark, require_driver_heap

    spark = get_spark()
    if scale >= 128:
        # the x64 default runs fine on an 8g driver (SOAK.md: 108 s); the
        # x256-class legs OOM it — refuse loudly up front (VERDICT r10
        # task 8)
        require_driver_heap(spark, 48, f"soak_curation x{scale}")
    root = "/tmp/spark_hydra_soak"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(f"{root}/warc", exist_ok=True)

    phases: list[tuple[str, int, int, float]] = []

    def phase(name, n_in, thunk):
        t0 = time.monotonic()
        n_out = thunk()
        dt = time.monotonic() - t0
        phases.append((name, n_in, n_out, round(dt, 1)))
        print(f"  {name}: {n_in} -> {n_out} rows, {dt:.1f}s", flush=True)
        return n_out

    # ---- fixture: scale ×N in three duplication tiers -----------------
    # i%8==0 : identical text        -> exact-dup families (exact_dedup)
    # i%8==1 : salt only words >=6ch -> near-dup families  (MinHash/LSH)
    # else   : salt words >=3ch      -> distinct documents (pass through)
    #
    # English-like surface (VERDICT r10 task 2): every doc gets a
    # stopword-rich opener (picked per BASE doc id, so exact-dup copies
    # stay byte-identical and near-dup copies stay similar) prepended
    # AFTER salting, and the salts are LETTERS-ONLY — the r9/r10 fixture
    # had no Gopher stopwords anywhere, digit salts broke the
    # alpha-word-fraction rule, and mean length sat on the 50-word
    # floor, so the STRICT gate (n_fail=0) had never passed a single
    # document in composition. Docs genuinely under the word floor
    # still fail honestly (the strict-pass fraction is ~3/4, not 1.0).
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
        # letters-only per-copy salt: digit salts make every salted word
        # non-alphabetic and fail the Gopher alpha-word rule by fixture
        s, i = "", i + 1
        while i:
            s += chr(ord("a") + i % 26)
            i //= 26
        return s

    if fixture == "zipf":
        # natural-statistics base corpus, materialized ONCE so the ×N
        # union below re-reads parquet instead of re-running the
        # generator per tier branch. No opener hack: the Zipf head IS
        # the stopword mass, so Gopher pass/fail is honest.
        from udata_datalake_service_spark.llm.synthtext import zipf_documents

        zipf_documents(spark, 5000, seed="soak-zipf", num_partitions=32).write.mode(
            "overwrite"
        ).parquet(f"{root}/base_docs")
        docs = spark.read.parquet(f"{root}/base_docs")
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    parts = []
    for i in range(scale):
        if i % 8 == 0:
            body = F.col("text")
        elif i % 8 == 1:
            body = F.regexp_replace(
                F.col("text"), r"([A-Za-z0-9]{6,})", f"$1s{_alpha26(i)}"
            )
        else:
            body = F.regexp_replace(
                F.col("text"), r"([A-Za-z0-9]{3,})", f"$1s{_alpha26(i)}"
            )
        text_col = (
            body
            if fixture == "zipf"
            else F.concat(opener_col, F.lit(" "), body)
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n0)).alias("doc_id"),
                text_col.alias("text"),
                "lang",
                "source",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)

    def synth():
        # one .warc.gz per partition, written by the EXECUTOR task —
        # fixture synthesis itself runs at full parallelism (local mode:
        # executors share the driver filesystem; a cluster would stage
        # to shared storage exactly like any Spark output)
        warc_dir = f"{root}/warc"

        def write_part(rows):
            from pyspark import TaskContext

            from udata_datalake_service_spark.sources.warc import write_warc

            recs = [
                (
                    {
                        "WARC-Type": "warcinfo",
                        "Content-Type": "application/warc-fields",
                    },
                    b"software: udata-datalake-service-spark\r\n",
                )
            ]
            n = 0
            for r in rows:
                i = r["doc_id"]
                status = 404 if i % 97 == 0 else 200
                # heading carries NO doc id: exact-dup copies must stay
                # byte-identical after extraction or exact_dedup sees none
                html = (
                    f"<html><body><h1>Document</h1><p>{r['text']}</p></body></html>"
                    if status == 200
                    else "<html><body><p>gone</p></body></html>"
                )
                recs.append(
                    (
                        {
                            "WARC-Type": "response",
                            "WARC-Record-ID": f"<urn:doc:{i}>",
                            "WARC-Target-URI": f"https://crawl.test/{r['lang']}/{r['source']}/doc-{i}",
                            "WARC-Date": "2026-01-01T00:00:00Z",
                            "Content-Type": "application/http; msgtype=response",
                        },
                        f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n".encode()
                        + html.encode(),
                    )
                )
                n += 1
            if n == 0:
                return
            pid = TaskContext.get().partitionId()
            tmp = os.path.join(warc_dir, f".crawl-{pid:02d}.warc.gz.tmp")
            with open(tmp, "wb") as f:
                f.write(write_warc(recs, gzip_members=True))
            os.replace(tmp, os.path.join(warc_dir, f"crawl-{pid:02d}.warc.gz"))

        big.repartition(32).foreachPartition(write_part)
        return len(os.listdir(warc_dir))

    n_docs = n0 * scale
    print(f"soak: {n_docs} docs ({scale}x of {sf_dir})", flush=True)
    n_files = phase("warc_synthesize (fixture)", n_docs, synth)
    assert n_files >= 32, n_files

    # ---- ingest: binaryFile -> record split -> envelope -> text ----
    from udata_datalake_service_spark.llm.html import html_to_text
    from udata_datalake_service_spark.sources.warc import read_warc

    def ingest():
        recs = read_warc(spark, f"{root}/warc").filter(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        out = recs.select(
            F.regexp_extract("target_uri", r"doc-(\d+)", 1)
            .cast("long")
            .alias("doc_id"),
            F.regexp_extract("target_uri", r"crawl\.test/([^/]+)/", 1).alias("lang"),
            F.regexp_extract("target_uri", r"crawl\.test/[^/]+/([^/]+)/", 1).alias(
                "source"
            ),
            html_to_text(F.col("payload").cast("string")).alias("text"),
        )
        out.write.mode("overwrite").parquet(f"{root}/ingested")
        return spark.read.parquet(f"{root}/ingested").count()

    n_ing = phase("warc_ingest", n_docs, ingest)

    # ---- gopher quality gate ----
    from udata_datalake_service_spark.llm.gopher import gopher_quality

    def gopher():
        d = spark.read.parquet(f"{root}/ingested")
        g = gopher_quality(d, text="text", id_col="doc_id").persist()
        # STRICT gate (n_fail=0) — the English-like fixture makes the
        # real production threshold runnable in composition (VERDICT r10
        # task 2); the relaxed count is reported alongside so the two
        # thresholds stay comparable round over round.
        n_relaxed = g.filter(F.col("n_fail") <= 2).count()
        kept = g.filter(F.col("gopher_pass")).select("doc_id")
        d.join(kept, "doc_id", "left_semi").write.mode("overwrite").parquet(
            f"{root}/gated"
        )
        g.unpersist()
        n_strict = spark.read.parquet(f"{root}/gated").count()
        print(
            f"    strict (n_fail=0) kept {n_strict}; relaxed (n_fail<=2) "
            f"would keep {n_relaxed}",
            flush=True,
        )
        return n_strict

    n_gate = phase("gopher_gate (STRICT n_fail=0)", n_ing, gopher)

    # ---- dedup: exact fingerprint + capped MinHash/LSH near-dup ----
    from udata_datalake_service_spark.llm.dedup import (
        exact_dedup,
        lsh_candidate_pairs,
        minhash_jaccard_estimate,
        minhash_signatures,
    )

    def dedup():
        d = spark.read.parquet(f"{root}/gated")
        ex = exact_dedup(d, text="text", id_col="doc_id")
        ex.write.mode("overwrite").parquet(f"{root}/exact")
        ex = spark.read.parquet(f"{root}/exact")
        # candidates are VERIFIED before dropping (estimate >= 0.5 at
        # candidate grain) — raw band collisions are not duplicates,
        # and the tiny synthetic vocabulary makes unrelated docs collide
        sigs = minhash_signatures(ex, num_hashes=8, k=2).persist()
        pairs = lsh_candidate_pairs(
            sigs, num_bands=4, rows_per_band=2, max_bucket=256
        )
        dups = minhash_jaccard_estimate(sigs, pairs).filter(
            F.col("jaccard_est") >= 0.5
        )
        drops = dups.select(F.col("id_b").alias("doc_id")).distinct()
        ex.join(drops, "doc_id", "left_anti").write.mode("overwrite").parquet(
            f"{root}/deduped"
        )
        sigs.unpersist()
        return spark.read.parquet(f"{root}/deduped").count()

    n_dedup = phase("dedup (exact + LSH cap=256)", n_gate, dedup)

    # ---- eval set (~100 items): base-doc texts, whose tier-0 copies
    # sit in the corpus VERBATIM — planted contamination the gated leg
    # must catch (and the near-dup tier sits lexically close to them)
    evalset = (
        docs.filter(F.col("doc_id") % 47 == 0)
        .select(F.col("doc_id").alias("query_id"), "text")
        .persist()
    )
    n_eval = evalset.count()

    # ---- retrieval-gated decontam: the rt_decontam review queue, run
    # against the composed post-dedup corpus and ACTED on (VERDICT r11
    # task 1). BM25 top-20 per eval item ∩ shared-5-gram evidence —
    # rank alone has no verbatim proof, k-gram alone has no closeness;
    # the intersection is the review queue, and this soak's drop rule
    # drops every queued doc.
    from udata_datalake_service_spark.llm.contamination import (
        _exploded_ngrams,
        decontaminate,
    )
    from udata_datalake_service_spark.llm.retrieval import bm25_topk

    def rt_gate():
        d = spark.read.parquet(f"{root}/deduped")
        bm = bm25_topk(d, evalset, k=20)
        ev_ng = _exploded_ngrams(
            evalset.withColumnRenamed("query_id", "doc_id"), "text", "doc_id", 5
        ).withColumnRenamed("doc_id", "query_id")
        c_ng = _exploded_ngrams(d, "text", "doc_id", 5)
        shared = (
            c_ng.join(F.broadcast(ev_ng), "ngram")
            .groupBy("query_id", "doc_id")
            .agg(F.count_distinct("ngram").alias("n_shared_ngrams"))
        )
        # BM25 side is rank-bounded (≤ 20·|eval|) — broadcast, so the
        # pair-grain n-gram aggregate never sort-merge-shuffles
        queue = shared.join(F.broadcast(bm), ["query_id", "doc_id"]).persist()
        n_queue = queue.count()
        drops = queue.select("doc_id").distinct()
        n_drop = drops.count()
        d.join(drops, "doc_id", "left_anti").write.mode("overwrite").parquet(
            f"{root}/rt_gated"
        )
        queue.unpersist()
        print(
            f"    review queue: {n_queue} (eval, doc) pairs over {n_eval} "
            f"eval items -> {n_drop} docs dropped",
            flush=True,
        )
        return spark.read.parquet(f"{root}/rt_gated").count()

    n_rt = phase("rt_decontam gate (BM25 top-20 ∩ 5-gram)", n_dedup, rt_gate)

    # ---- blunt k-gram decontamination over what the gated leg kept ----
    def decontam():
        d = spark.read.parquet(f"{root}/rt_gated")
        bench = evalset.withColumnRenamed("query_id", "doc_id")
        decontaminate(d, bench, text="text", id_col="doc_id", k=5).write.mode(
            "overwrite"
        ).parquet(f"{root}/clean")
        return spark.read.parquet(f"{root}/clean").count()

    n_clean = phase("decontam (k=5)", n_rt, decontam)

    # ---- hard-negatives export from the final clean corpus ----
    from udata_datalake_service_spark.llm.retrieval import hard_negatives

    def negatives():
        d = spark.read.parquet(f"{root}/clean")
        hard_negatives(
            d, evalset, k=20, shingle_k=3, max_jaccard=0.5
        ).write.mode("overwrite").parquet(f"{root}/hard_negatives")
        return spark.read.parquet(f"{root}/hard_negatives").count()

    phase("hard_negatives export (k=20, jac<0.5)", n_eval, negatives)

    # ---- stratified mixing ----
    from udata_datalake_service_spark.llm.mixing import stratified_mix

    def mix():
        d = spark.read.parquet(f"{root}/clean")
        langs = [r["lang"] for r in d.select("lang").distinct().collect()]
        rates = {
            lg: (1.0 if j % 2 == 0 else 0.5) for j, lg in enumerate(sorted(langs))
        }
        stratified_mix(
            d, "lang", rates, key_cols=["doc_id"], seed="soak0"
        ).write.mode("overwrite").parquet(f"{root}/mixed")
        return spark.read.parquet(f"{root}/mixed").count()

    n_mix = phase("stratified_mix", n_clean, mix)

    # ---- training shards into the OBJECT STORE (moto) ----
    def shards():
        import logging

        import boto3
        from moto.server import ThreadedMotoServer

        logging.getLogger("werkzeug").setLevel(logging.ERROR)

        from udata_datalake_service_spark.sinks.lake import Lake
        from udata_datalake_service_spark.sinks.store import S3ObjectStore

        server = ThreadedMotoServer(port=0)
        server.start()
        port = server._server.socket.getsockname()[1]
        client = boto3.client(
            "s3",
            endpoint_url=f"http://127.0.0.1:{port}",
            aws_access_key_id="test",
            aws_secret_access_key="test",
            region_name="us-east-1",
        )
        client.create_bucket(Bucket="soak")
        lake = Lake(spark, f"{root}/lake", store=S3ObjectStore("soak", client))
        d = spark.read.parquet(f"{root}/mixed").withColumn(
            "row_key", F.concat_ws("#", "doc_id", "copy_idx")
        )
        manifest = lake.write_training_shards(
            d, "corpus_shards", 32, ["row_key"], seed="soak-shards"
        )
        rows = manifest.collect()
        total = sum(r["n_rows"] for r in rows)
        # verify from the BUCKET: committed part objects live server-side
        n_objs = 0
        paginator = client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket="soak"):
            n_objs += len(page.get("Contents", []))
        print(
            f"    manifest: {len(rows)} shards, {total} rows; "
            f"{n_objs} objects in bucket",
            flush=True,
        )
        assert len(rows) == 32, rows
        assert total == n_mix, (total, n_mix)
        assert n_objs > 32, n_objs
        server.stop()
        return total

    phase("write_training_shards (S3ObjectStore)", n_mix, shards)

    print(
        f"\ncorpus: {n_docs} docs ({scale}x, fixture={fixture}"
        + ("" if fixture == "zipf" else f", {sf_dir}")
        + f"), {n_files} WARC files; eval set {n_eval} items"
    )
    print("| phase | rows in | rows out | wall s |")
    print("|---|---|---|---|")
    for name, n_in, n_out, dt in phases:
        print(f"| {name} | {n_in} | {n_out} | {dt} |")
    total_s = round(sum(p[3] for p in phases), 1)
    print(f"| **total** | | | **{total_s}** |")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
