"""Streaming first-order transitions — the incremental sibling of
`operators/markov.event_transitions`.

The batch form's lag window needs the whole history per key; the stream
carries ONE state row per key (the last event seen) and emits an
adjacency row per arriving event — constant state per key, arrow batches
per trigger, shuffle only on the sequence key. The transition MATRIX is
then any downstream aggregation of the adjacency stream (count by
(prev, next) — a plain streaming agg or a batch rollup over the sink),
which is how a 100 TB events firehose keeps a live next-event prior.

Ordering contract (same as `change_detection_stream`): rows within a
micro-batch are sorted by (ts, event_id); micro-batches are assumed to
arrive in time order (file-source name order / availableNow replay). Late
events across batches would need watermarked reordering upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_ADJ_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_event", StringType()),
        StructField("next_event", StringType()),
        StructField("ts", TimestampType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("last_ts", TimestampType()), StructField("last_event", StringType())]
)


def _emit_adjacencies(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        last_ts, last_event = state.get
    else:
        last_ts, last_event = None, None
    rows = []
    # concatenate the key's Arrow chunks BEFORE sorting: a per-chunk sort
    # would misorder rows that straddle a chunk boundary (state is per-key,
    # so memory stays bounded by the key's share of one micro-batch)
    chunks = [c for c in pdf_iter if len(c)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for r in pdf.itertuples(index=False):
            if last_event is not None:
                rows.append(
                    {
                        "user_id": key[0],
                        "prev_event": last_event,
                        "next_event": r.event_type,
                        "ts": r.ts,
                    }
                )
            last_ts, last_event = r.ts, r.event_type
    state.update((last_ts, last_event))
    yield pd.DataFrame(rows, columns=[f.name for f in _ADJ_SCHEMA])


def transitions_stream(events_stream: DataFrame) -> DataFrame:
    """Keyed stateful adjacency stream: (user_id, prev_event, next_event,
    ts) per arriving event after a key's first."""
    return (
        events_stream.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _emit_adjacencies,
            outputStructType=_ADJ_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
