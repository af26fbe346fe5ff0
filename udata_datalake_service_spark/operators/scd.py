"""SCD Type-2 merge: history-preserving dimension updates.

The reference's catalog upsert is SCD1 — new values overwrite
(``db/resource.py`` update path); its CHECKS table keeps history by
being append-only. SCD2 is the third classic shape: one row per VERSION
of an entity, ``valid_from``/``valid_to`` bounding each version's life
and ``is_current`` marking the open one — the dimension-table idiom
every warehouse MERGE implements (Kimball type 2; Delta's
``whenMatchedUpdate`` + ``whenNotMatchedInsert`` choreography).

``scd2_merge`` is the batch-functional form: given the current SCD2
table and an updates frame (one candidate version per key, latest-ts
wins), it returns the NEW table state —

* unknown key → insert an open version;
* known key, tracked attributes changed (null-safely) → close the open
  row at the update's timestamp and insert the new open version;
* known key, unchanged → no-op (no version churn from reprocessing);
* untouched keys and all historical rows pass through.

Shape: latest-per-key window on the (small) updates side, ONE full
outer equi-join against the open rows only (historical rows never
join), map-only projections after. At 100 TB the open-row slice is
entity-count-sized, not history-sized — bucket both sides by key for a
shuffle-free merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    ts_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Return the post-merge SCD2 table state (same schema as
    ``current``). ``updates`` must carry ``key_cols``, ``tracked_cols``
    and ``ts_col`` (the new version's effective timestamp)."""
    keys = list(key_cols)
    tracked = list(tracked_cols)

    # latest-per-key with a DETERMINISTIC tiebreak: equal-timestamp
    # duplicate updates (two sources emitting in one batch window) order
    # by the tracked values themselves, so the same merge on the same
    # inputs always closes the open row with the same winner
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(t).desc_nulls_last() for t in tracked]
    )
    upd = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    hist = current.filter(~F.col(current_col))
    open_rows = current.filter(F.col(current_col))

    c = open_rows.alias("c")
    u = upd.alias("u")
    joined = c.join(u, on=keys, how="full")

    changed: Column = F.lit(False)
    for t in tracked:
        changed = changed | ~F.col(f"c.{t}").eqNullSafe(F.col(f"u.{t}"))
    has_c = F.col(f"c.{ts_col}").isNotNull()
    has_u = F.col(f"u.{ts_col}").isNotNull()

    out_cols = current.columns
    attr_cols = [x for x in out_cols if x not in (*keys, ts_col, valid_to_col, current_col)]

    # surviving version of the pre-existing open row: closed if replaced
    kept_open = joined.filter(has_c).select(
        *[F.col(k) for k in keys],
        *[F.col(f"c.{a}").alias(a) for a in attr_cols],
        F.col(f"c.{ts_col}").alias(ts_col),
        F.when(has_u & changed, F.col(f"u.{ts_col}"))
        .otherwise(F.col(f"c.{valid_to_col}"))
        .alias(valid_to_col),
        (~(has_u & changed)).alias(current_col),
    )
    # freshly-opened versions: new keys, or changed tracked attributes
    inserted = joined.filter(has_u & (~has_c | changed)).select(
        *[F.col(k) for k in keys],
        *[F.col(f"u.{a}").alias(a) for a in attr_cols],
        F.col(f"u.{ts_col}").alias(ts_col),
        F.lit(None).cast(current.schema[valid_to_col].dataType).alias(valid_to_col),
        F.lit(True).alias(current_col),
    )
    return hist.select(*out_cols).unionByName(
        kept_open.select(*out_cols)
    ).unionByName(inserted.select(*out_cols))
