"""Custom stateful streaming operators (applyInPandasWithState).

:func:`dedup_stream` — cross-micro-batch exact deduplication: the first
document to arrive with a given content key is emitted; every later
arrival (same batch or any later batch) is dropped. State is one marker
per content key, managed by Spark's state store (RocksDB/HDFS-backed on a
cluster), so the operator survives restarts via the streaming checkpoint
and scales horizontally: state is hash-partitioned by the content key,
exactly like the batch engine's shuffle.

This is the streaming twin of ``operators.dedup.exact_duplicates``; use
Spark's built-in ``dropDuplicates`` + watermark when arrival-time-bounded
state eviction is acceptable — this operator keeps keys forever (the
training-data dedup contract: a duplicate is a duplicate regardless of
how far apart the copies arrive), so pair it with snapshot compaction at
10^12-doc scale.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import normalized_text

_STATE_SCHEMA = T.StructType([T.StructField("emitted", T.IntegerType())])


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """First-seen filter over a streaming documents frame.

    Output schema: (content_key long, doc_id <input id type>) — the id
    of the FIRST document observed per normalized-content key (ties
    within one micro-batch resolve to the smallest id in the id column's
    OWN type ordering, deterministically — a numeric id column is
    tie-broken numerically, not lexicographically; the column keeps its
    input type end-to-end).
    """
    id_type = stream.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("content_key", T.LongType()),
            T.StructField("doc_id", id_type),
        ]
    )

    def first_seen(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # key already emitted in an earlier micro-batch: drain and drop
            for _ in batches:
                pass
            return
        best = None
        for pdf in batches:
            if len(pdf):
                cand = pdf["doc_id"].min()  # min in the column's own dtype
                best = cand if best is None or cand < best else best
        if best is None:
            return
        state.update((1,))
        yield pd.DataFrame({"content_key": [key[0]], "doc_id": [best]})

    keyed = stream.select(
        F.xxhash64(normalized_text(F.col(text_col))).alias("content_key"),
        F.col(id_col).alias("doc_id"),
    )
    return keyed.groupBy("content_key").applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    keys: tuple = ("event_type",),
) -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark.

    Append-mode semantics: a window only emits once the watermark (max
    observed event time minus ``watermark``) passes its end, and events
    arriving later than the watermark are DROPPED — the bounded-state
    contract that lets this run forever on an unbounded stream. The batch
    twin (same results on complete data) is the ``events_window_counts``
    gate query.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n",
        )
    )
