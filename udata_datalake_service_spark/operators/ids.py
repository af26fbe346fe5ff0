"""Scalable global row numbering — contiguous ids without the
single-partition sort.

Not in the reference (udata-hydra rows carry server-generated UUID /
SERIAL ids — ``migrations/20221011_create_catalog_and_checks_tables.sql``
— which a database hands out transactionally); first-class here because
a training-data pipeline constantly needs a stable, dense, 0-based
ordinal over a corpus (shard assignment, example indices for data
loaders, deterministic train/eval splits by id range) and neither of
Spark's built-ins gives it:

* ``F.monotonically_increasing_id()`` is sparse (partition id in the
  high bits) — fine as a surrogate key, useless as an ordinal;
* ``F.row_number().over(Window.orderBy(...))`` with no partition spec
  is correct but collapses the whole table into ONE partition for the
  sort — the canonical 100 TB anti-pattern (Spark itself warns).

The scalable recipe (the DataFrame-native form of the classic two-pass
``zipWithIndex``):

1. range-repartition + sort on the order key — ONE exchange, the same
   one a global ``orderBy`` needs anyway; partition p holds the rows
   ranked before every row of partition p+1;
2. pin the partitioning (``persist``) — RangePartitioner SAMPLES to pick
   its bounds, so an unpinned plan could re-sample different bounds
   between the counting job and the id job and mis-offset every id;
3. count rows per partition (≤ numPartitions rows to the driver — the
   only driver-side data, bounded by cluster config, not by data);
4. prefix-sum those counts into per-partition base offsets and stamp
   ``id = base[pid] + position-within-partition`` in a single
   ``mapInPandas`` pass — no second shuffle: a window partitioned by
   partition-id would re-hash-exchange the full table, whereas the
   Arrow iterator walks each (already sorted) partition in order.

Determinism contract: ids are reproducible iff ``order_by`` is a total
order (include a unique tiebreak column, same as any ORDER BY).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from udata_datalake_service_spark.caching import adopt

_PID = "__dense_pid"


def dense_ids(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "rid",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense 0-based ``id_col`` numbering ``df`` by ``order_by``.

    Equivalent to ``ROW_NUMBER() OVER (ORDER BY ...) - 1`` but scales:
    the plan is range-exchange → per-partition sort → Arrow map, never a
    single-partition window. The sorted+persisted intermediate is
    adopted onto the result (caller settles at its action boundary).
    """
    if not order_by:
        raise ValueError("dense_ids: order_by must name at least one column")
    cols = [F.col(c) for c in order_by]
    parts = df.repartitionByRange(
        num_partitions
        or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        *cols,
    ).sortWithinPartitions(*cols)
    # Pin the sampled range bounds before running two jobs over them.
    parts = parts.withColumn(_PID, F.spark_partition_id()).persist()

    sizes = {
        r[_PID]: r["n"]
        for r in parts.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        base[pid] = acc
        acc += sizes[pid]

    out_schema = StructType(
        [f for f in parts.schema.fields if f.name != _PID]
        + [StructField(id_col, LongType(), False)]
    )
    out_cols = [f.name for f in out_schema.fields]

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        start = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if start is None:
                start = base[int(pdf[_PID].iloc[0])]
            pdf = pdf.drop(columns=[_PID])
            pdf[id_col] = range(start + seen, start + seen + len(pdf))
            seen += len(pdf)
            yield pdf[out_cols]

    return adopt(parts.mapInPandas(stamp, schema=out_schema), parts)
