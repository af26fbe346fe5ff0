r"""The serving plane: the reference's HTTP API surface, route for route,
over the lake (routes/__init__.py:51-77 → methods here).

The aiohttp/auth/marshmallow layers are transport, not query semantics —
what this binds is every route's *data contract*: same parameters, same
result shape, computed by the Spark plans in ``operators``/``plans``. A
deployment would wrap this class with any HTTP framework (or expose the
registered temp views through Spark Connect / Thrift).

| reference route | method here |
|---|---|
| GET /api/checks/latest?url\|resource_id     | latest_check |
| GET /api/checks/all?url\|resource_id        | all_checks |
| GET /api/checks/aggregate?group_by&created_at | checks_aggregate |
| POST /api/checks (on-demand check)          | run_checks (fetch plane) |
| GET/POST/PUT/DELETE /api/resources          | get/upsert/delete_resource |
| GET /api/resources/<id>/status              | resource_status |
| GET /api/status/crawler                     | crawler_status |
| GET /api/status/worker                      | worker_status |
| GET /api/stats                              | stats |
| GET /api/health                             | health |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udata_datalake_service_spark.config import Config
from udata_datalake_service_spark.operators import checks as checks_ops
from udata_datalake_service_spark.sinks.lake import Lake


class HydraService:
    """Route-shaped facade over a :class:`Lake` holding the ``catalog`` and
    ``checks`` app tables. ``config`` mirrors the reference's
    config_default.toml knobs (see :mod:`config`); defaults match the
    reference's shipped values."""

    def __init__(
        self, spark: SparkSession, lake: Lake, config: Config | None = None
    ):
        self.spark = spark
        self.lake = lake
        self.config = config or Config()

    def sql(self, query: str, extra_views: dict[str, DataFrame] | None = None) -> DataFrame:
        """Ad-hoc SQL over the lake: registers the app tables (catalog,
        checks — when present), the converted-tables registry as
        ``tables_index``, the converted tables the QUERY actually names
        (``t_<md5>`` — only referenced ones resolve, so a catalog with
        thousands of tables costs nothing on unrelated queries), and any
        ``extra_views``, then runs ``query`` through Catalyst. The
        escape hatch the reference's Postgres users keep: anything the
        facade doesn't wrap is one SELECT away. A table that exists in
        the registry but can't be read (dropped mid-flight, corrupt
        version dir) is skipped — the query then fails with Catalyst's
        table-not-found naming it, instead of this method aborting."""
        import re

        for name in ("catalog", "checks"):
            try:
                self.lake.read_app_table(name).createOrReplaceTempView(name)
            except FileNotFoundError:
                pass
        try:
            self.lake.registry().createOrReplaceTempView("tables_index")
        except FileNotFoundError:
            pass
        for t in set(re.findall(r"\bt_([0-9a-f]{6,32})\b", query)):
            try:
                self.lake.read_table(t).createOrReplaceTempView(f"t_{t}")
            except Exception:  # noqa: BLE001 — Catalyst names the gap
                pass
        for name, df in (extra_views or {}).items():
            df.createOrReplaceTempView(name)
        return self.spark.sql(query)

    # -------------------------------------------------------------- tables --
    @property
    def catalog(self) -> DataFrame:
        return self.lake.read_app_table("catalog")

    @property
    def checks(self) -> DataFrame:
        return self.lake.read_app_table("checks")

    # --------------------------------------------------------------- checks --
    def latest_check(self, **key) -> DataFrame:
        """GET /api/checks/latest?url=… or ?resource_id=… (J1)."""
        return checks_ops.latest_check(self.catalog, self.checks, **key)

    def all_checks(self, **key) -> DataFrame:
        """GET /api/checks/all (J2), newest first."""
        return checks_ops.all_checks(self.catalog, self.checks, **key)

    def checks_aggregate(self, group_by: str, created_at) -> DataFrame:
        """GET /api/checks/aggregate — ``group_by`` is an EXPRESSION (the
        reference interpolates it into SQL, db/check.py:87-98; same surface,
        same injection caveat → allowlist in any public deployment)."""
        return checks_ops.aggregate_for_date(self.checks, group_by, created_at)

    def run_checks(self, batch: DataFrame, transport=None, fan_out: int | None = None) -> DataFrame:
        """POST /api/checks — on-demand check execution (S1 fetch plane)."""
        from udata_datalake_service_spark.plans.fetch import check_batch, urllib_transport

        return check_batch(batch, transport or urllib_transport, fan_out=fan_out)

    # ------------------------------------------------------------ resources --
    def get_resource(self, resource_id: str) -> DataFrame:
        """GET /api/resources/<id> (P1)."""
        return self.catalog.filter(F.col("resource_id") == resource_id)

    def resource_status(self, resource_id: str) -> DataFrame:
        """GET /api/resources/<id>/status — status + last check pointer."""
        return self.get_resource(resource_id).select(
            "resource_id", "status", "last_check", "priority", "deleted"
        )

    def upsert_resource(self, rows: DataFrame) -> None:
        """POST/PUT /api/resources (U2) — merge by resource_id, rewrite the
        catalog table (Delta MERGE in a transactional deployment)."""
        from udata_datalake_service_spark.operators.core import upsert

        merged = upsert(self.catalog, rows, key="resource_id")
        self.lake.rewrite_app_table(merged, "catalog")

    def delete_resource(self, resource_id: str) -> None:
        """DELETE /api/resources/<id> (U5 soft delete)."""
        updated = self.catalog.withColumn(
            "deleted",
            F.when(F.col("resource_id") == resource_id, F.lit(True)).otherwise(
                F.col("deleted")
            ),
        )
        self.lake.rewrite_app_table(updated, "catalog")

    # ------------------------------------------------------------ exceptions --
    @property
    def exceptions(self):
        """GET/POST/PUT/DELETE /api/resources-exceptions
        (routes/resources_exceptions.py:14-55) — see operators/exceptions."""
        from udata_datalake_service_spark.operators.exceptions import (
            ResourceExceptions,
        )

        return ResourceExceptions(self.spark, self.lake)

    # ----------------------------------------------------------- crawl plane --
    def select_crawl_batch(self, seed: str = "s0") -> DataFrame:
        """The crawl loop's batch selection (J3/U7 surface) with every knob
        driven by the config: batch size, excluded patterns."""
        from udata_datalake_service_spark.plans.select_batch import select_batch

        return select_batch(
            self.catalog,
            self.checks,
            batch_size=self.config.batch_size,
            seed=seed,
            excluded_patterns=self.config.excluded_patterns,
        )

    def backoff_table(self) -> DataFrame:
        """Per-domain backoff decisions (ST2/A5) with config-driven
        thresholds and the NO_BACKOFF_DOMAINS allowlist."""
        from udata_datalake_service_spark.plans.backoff import domain_backoff_table

        return domain_backoff_table(
            self.checks,
            nb_req=self.config.backoff_nb_req,
            period_s=self.config.backoff_period,
            cool_off_s=self.config.cool_off_period,
            no_backoff_domains=self.config.no_backoff_domains,
        )

    # -------------------------------------------------------------- status --
    def crawler_status(self) -> DataFrame:
        """GET /api/status/crawler (A2)."""
        return checks_ops.crawler_status(self.catalog, self.checks)

    def worker_status(self) -> DataFrame:
        """GET /api/status/worker (A3)."""
        return checks_ops.worker_status(self.catalog)

    def stats(self) -> DataFrame:
        """GET /api/stats (A4)."""
        return checks_ops.stats(self.catalog, self.checks)

    def health(self) -> dict:
        """GET /api/health — storage reachable + spark alive."""
        try:
            n = self.catalog.limit(1).count()
            return {"ok": True, "catalog_reachable": True, "sample_rows": n}
        except Exception as e:  # noqa: BLE001
            return {"ok": False, "error": str(e)}

    # ---------------------------------------------- beyond-ref analytics ----
    # The serving-plane face of the analytics operators this engine adds on
    # top of the reference's route table: availability SLAs over the checks
    # series, and funnel/cohort over any keyed event frame (the reference
    # has no events plane; these take the frame explicitly).

    def availability_report(self) -> DataFrame:
        """Per-resource availability + longest consecutive-failure streak
        over the checks series (gaps-and-islands; failure = status absent
        or outside [200, 400))."""
        from pyspark.sql import Window

        c = self.checks.select(
            "resource_id",
            "id",
            F.unix_micros(F.col("created_at").cast("timestamp")).alias("us"),
            (
                F.col("status").isNull()
                | (F.col("status") < 200)
                | (F.col("status") >= 400)
            ).alias("is_err"),
        )
        w = Window.partitionBy("resource_id").orderBy("us", "id")
        with_rn = c.withColumn("rn", F.row_number().over(w))
        errs = with_rn.filter(F.col("is_err")).withColumn("rn2", F.row_number().over(w))
        streaks = (
            errs.groupBy("resource_id", (F.col("rn") - F.col("rn2")).alias("g"))
            .agg(F.count(F.lit(1)).alias("len"))
            .groupBy("resource_id")
            .agg(F.max("len").alias("longest_failure_streak"))
        )
        totals = c.groupBy("resource_id").agg(
            F.count(F.lit(1)).alias("n_checks"),
            F.count_if(F.col("is_err")).alias("n_failures"),
        )
        return (
            totals.join(streaks, on="resource_id", how="left")
            .select(
                "resource_id",
                "n_checks",
                "n_failures",
                F.round(1 - F.col("n_failures") / F.col("n_checks"), 6).alias(
                    "availability"
                ),
                F.coalesce("longest_failure_streak", F.lit(0)).cast("long").alias(
                    "longest_failure_streak"
                ),
            )
        )

    def funnel(self, events: DataFrame, steps: list[str], horizon_s: int, **kw) -> DataFrame:
        """Window-funnel depth per key (operators/funnel.funnel_levels)."""
        from udata_datalake_service_spark.operators.funnel import funnel_levels

        return funnel_levels(events, steps, horizon_s, **kw)

    def cohort_retention(self, events: DataFrame, **kw) -> DataFrame:
        """Cohort retention matrix (operators/funnel.cohort_retention)."""
        from udata_datalake_service_spark.operators.funnel import cohort_retention

        return cohort_retention(events, **kw)

    # ------------------------------------------------- curation plane ----
    def corpus_datasheet(self, docs: DataFrame, **kw) -> DataFrame:
        """The corpus audit report (llm/report.corpus_datasheet)."""
        from udata_datalake_service_spark.llm.report import corpus_datasheet

        return corpus_datasheet(docs, **kw)

    def quality_gate(self, docs: DataFrame, **kw) -> DataFrame:
        """Gopher rule table per document (llm/gopher.gopher_quality)."""
        from udata_datalake_service_spark.llm.gopher import gopher_quality

        return gopher_quality(docs, **kw)

    def importance_weights(self, docs: DataFrame, is_target, **kw) -> DataFrame:
        """DSIR log importance weights (llm/tfidf.dsir_log_weights)."""
        from udata_datalake_service_spark.llm.tfidf import dsir_log_weights

        return dsir_log_weights(docs, is_target, **kw)

    def semantic_dedup(self, embeddings: DataFrame, **kw) -> DataFrame:
        """SemDeDup verdicts per vector (llm/similarity.semantic_dedup)."""
        from udata_datalake_service_spark.llm.similarity import semantic_dedup

        return semantic_dedup(embeddings, **kw)

    def curriculum(self, docs: DataFrame, score: str, **kw) -> DataFrame:
        """Score-quantile curriculum buckets (llm/mixing.curriculum_buckets)."""
        from udata_datalake_service_spark.llm.mixing import curriculum_buckets

        return curriculum_buckets(docs, score, **kw)

    def ann_recall(self, exact: DataFrame, approx: DataFrame) -> DataFrame:
        """Recall@k of an ANN path vs the exact top-k (llm/similarity
        .recall_at_k) — the index-quality gate."""
        from udata_datalake_service_spark.llm.similarity import recall_at_k

        return recall_at_k(exact, approx)

    def novelty(self, docs: DataFrame, **kw) -> DataFrame:
        """First-occurrence n-gram novelty per doc under stream order
        (llm/corpus.ngram_novelty) — the marginal-data-value curve."""
        from udata_datalake_service_spark.llm.corpus import ngram_novelty

        return ngram_novelty(docs, **kw)

    def paragraph_dedup(self, docs: DataFrame, **kw) -> DataFrame:
        """C4-style global paragraph dedup with text reconstruction
        (llm/corpus.paragraph_dedup)."""
        from udata_datalake_service_spark.llm.corpus import paragraph_dedup

        return paragraph_dedup(docs, **kw)

    def padding_waste(self, docs: DataFrame, len_col: str, **kw) -> DataFrame:
        """Pad-token overhead, arrival vs length-sorted batching
        (llm/corpus.padding_waste_report)."""
        from udata_datalake_service_spark.llm.corpus import padding_waste_report

        return padding_waste_report(docs, len_col, **kw)

    def url_filter(self, df: DataFrame, **kw) -> DataFrame:
        """URL-level quality gate + signals (functions/urls
        .url_quality_filter) — the pre-fetch crawl filter."""
        from udata_datalake_service_spark.functions.urls import url_quality_filter

        return url_quality_filter(df, **kw)

    def html_text(self, df: DataFrame, html_col: str = "html") -> DataFrame:
        """Visible-text extraction + boilerplate signals over an HTML
        column (llm/html.py) — the raw-crawl-to-corpus boundary."""
        from udata_datalake_service_spark.llm.html import html_signals, html_to_text

        sig = html_signals(F.col(html_col))
        out = df.withColumn("text", html_to_text(F.col(html_col)))
        for name, col in sig.items():
            out = out.withColumn(name, col)
        return out

    def expectations_report(self, df: DataFrame, rules: dict) -> DataFrame:
        """Per-rule data-quality violation scorecard
        (operators/expectations.report)."""
        from udata_datalake_service_spark.operators.expectations import report

        return report(df, rules)

    def expectations_split(self, df: DataFrame, rules: dict):
        """(valid, quarantined) halves under a rule set
        (operators/expectations.split)."""
        from udata_datalake_service_spark.operators.expectations import split

        return split(df, rules)

    def scd2_merge(self, current: DataFrame, updates: DataFrame, keys, tracked, **kw) -> DataFrame:
        """History-preserving dimension merge (operators/scd.scd2_merge)."""
        from udata_datalake_service_spark.operators.scd import scd2_merge

        return scd2_merge(current, updates, keys, tracked, **kw)

    def pagerank(self, edges: DataFrame, **kw) -> DataFrame:
        """Rank-by-reference over an edge list (operators/graph.pagerank)
        — crawl-prioritization authority scores."""
        from udata_datalake_service_spark.operators.graph import pagerank

        return pagerank(edges, **kw)

    def ingest_corpus(self, docs: DataFrame, batch_id: str, **kw) -> dict:
        """Idempotent dedup-on-arrival corpus ingestion
        (llm/ingest.ingest_documents) into this service's lake."""
        from udata_datalake_service_spark.llm.ingest import ingest_documents

        return ingest_documents(self.lake, docs, batch_id, **kw)
