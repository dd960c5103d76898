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
state eviction is acceptable — by default this operator keeps keys
forever (the training-data dedup contract: a duplicate is a duplicate
regardless of how far apart the copies arrive), so either pair it with
snapshot compaction at 10^12-doc scale or pass ``ttl=`` to bound state
growth by evicting keys idle longer than the TTL (documented trade-off:
a duplicate arriving after its key was evicted re-emits).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import normalized_text

_STATE_SCHEMA = T.StructType([T.StructField("emitted", T.IntegerType())])

_TTL_UNIT_MS = {
    "millisecond": 1, "milliseconds": 1, "ms": 1,
    "second": 1000, "seconds": 1000, "s": 1000,
    "minute": 60_000, "minutes": 60_000, "min": 60_000,
    "hour": 3_600_000, "hours": 3_600_000, "h": 3_600_000,
    "day": 86_400_000, "days": 86_400_000, "d": 86_400_000,
}


def _ttl_ms(ttl) -> int:
    """Duration string ("30 minutes") or int ms -> milliseconds; PySpark's
    GroupState.setTimeoutDuration only accepts the int form."""
    if isinstance(ttl, int):
        ms = ttl
    else:
        try:
            value, unit = ttl.strip().split()
            ms = int(value) * _TTL_UNIT_MS[unit.lower()]
        except (ValueError, KeyError):
            raise ValueError(
                "ttl must be int milliseconds or '<n> <unit>' with unit in %s; "
                "got %r" % (sorted(_TTL_UNIT_MS), ttl)
            ) from None
    if ms <= 0:
        raise ValueError("ttl must be positive, got %r" % (ttl,))
    return ms


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl: Optional[str] = None,
) -> DataFrame:
    """First-seen filter over a streaming documents frame.

    Output schema: (content_key long, doc_id <input id type>) — the id
    of the FIRST document observed per normalized-content key (ties
    within one micro-batch resolve to the smallest id in the id column's
    OWN type ordering, deterministically — a numeric id column is
    tie-broken numerically, not lexicographically; the column keeps its
    input type end-to-end).

    ``ttl`` (a duration string, e.g. ``"30 minutes"``) bounds state
    growth on unbounded streams: a key's state is evicted after the TTL
    elapses with no new sighting (processing-time timeout, refreshed on
    every arrival of the key — duplicates arriving within the TTL keep
    the key alive). Trade-off, documented: a duplicate arriving AFTER
    its key was evicted is treated as first-seen and re-emits, so choose
    a TTL longer than the plausible duplicate-arrival spread. Default
    ``None`` keeps keys forever (exact dedup at any distance; state grows
    with distinct keys).
    """
    id_type = stream.schema[id_col].dataType
    ttl_ms = _ttl_ms(ttl) if ttl is not None else None
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
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL: evict. The batches iterator carries no
            # rows for a timed-out key, but the Arrow protocol still
            # requires draining it before returning.
            for _ in batches:
                pass
            state.remove()
            return
        if state.exists:
            # key already emitted in an earlier micro-batch: drain and drop.
            # Processing-time timeouts are cleared on every invocation, so
            # re-arm to implement TTL-since-last-sighting.
            for _ in batches:
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        best = None
        for pdf in batches:
            if len(pdf):
                cand = pdf["doc_id"].min()  # min in the column's own dtype
                best = cand if best is None or cand < best else best
        if best is None:
            return
        state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
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
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
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
