"""Streaming ingest of the events table pattern.

The reference is batch-only (SURVEY.md §2.7); its nearest streaming
concept is the server-mode task queue (lightning/config/configlist.go)
that feeds identical batch pipelines. This module provides the
Spark-native streaming twins of the batch operators so the engine
covers continuous ingestion:

- ``stream_events``: file-source readStream with the same schema the
  batch path uses — micro-batched restore of a growing dump dir.
- ``windowed_counts``: tumbling event-time window aggregate with a
  watermark for late data.
- ``streaming_checksum``: running C1 checksum triple per micro-batch
  via foreachBatch (the XOR monoid makes the combine trivially
  incremental — Checksum.add, checksum.go:77-86).
- ``sessionize``: session windows per user (session_window).

Batch equivalence: every streaming aggregate here has a batch twin in
registry.py (events_tumbling_window); tests assert the streaming
result over a static file source equals the batch result — the same
golden-value strategy the reference's integration suite uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream: each new file in source_dir is one
    micro-batch chunk (the streaming analog of chunk discovery S1)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(source_dir)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + sums with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """SLIDING-window counts + sums (hopping windows): each event
    lands in window/slide overlapping windows. Late data handled by
    the watermark; state is bounded by (#windows in watermark
    horizon) x (#event types) — the overlap factor multiplies state
    size, not shuffle width, so the 100 TB shape matches tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a new session after ``gap`` idle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: duplicates arriving
    within the watermark horizon are dropped; state for keys older
    than the watermark is evicted (``dropDuplicatesWithinWatermark``)
    — the streaming twin of the batch exact-dedup operator, with the
    state-size guarantee an unbounded ``dropDuplicates`` lacks at
    100 TB/day stream rates."""
    keys = keys or ["user_id", "event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream event-time interval join: each purchase matched
    to the same user's clicks in the preceding ``horizon``. Both
    sides carry a watermark and the join condition bounds event time
    in BOTH directions, so Spark can evict join state older than
    watermark+horizon — the property that keeps a stream-stream join
    viable at an unbounded 100 TB/day rate (an unbounded-state join
    would OOM). Works identically on batch frames (the batch twin is
    ``click_purchase_attribution`` in registry.py)."""
    c = clicks.alias("c")
    p = purchases.alias("p")
    if clicks.isStreaming:
        c = clicks.withWatermark("ts", watermark).alias("c")
        p = purchases.withWatermark("ts", watermark).alias("p")
    return c.join(
        p,
        F.expr(
            "c.user_id = p.user_id AND "
            f"p.ts >= c.ts AND p.ts < c.ts + INTERVAL {horizon}"
        ),
    ).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
    )


USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)
_USER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("last", T.LongType()),
    ]
)


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (count, value-sum, last-seen) maintained in the
    state store across micro-batches, updated rows emitted each batch.

    This is the escape hatch for stateful semantics the built-in
    windowed aggregates can't express (per-key accumulators, custom
    eviction, model state). State is partitioned by the group key —
    the same shuffle boundary a batch groupBy would have, so the
    operator scales exactly like the aggregation it replaces."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            n, s, last = state.get
        else:
            n, s, last = 0, 0.0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).astype(float).sum())
            # pandas Timestamp.value is ns since epoch -> microseconds
            last = max(last, int(pd.Timestamp(pdf["ts"].max()).value // 1000))
        state.update((int(n), float(s), int(last)))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [int(n)],
                "value_sum": [float(s)],
                "last_ts_us": [int(last)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        USER_STATS_SCHEMA,
        _USER_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def streaming_checksum(
    events: DataFrame, checkpoint_dir: str, out: list
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """Running checksum over a stream via foreachBatch: per batch the
    C1 triple is computed (one agg) and XOR/sum-merged into ``out``
    — the monoid Add from checksum.go:77-86 applied across
    micro-batches."""
    from ..functions.checksum import Checksum, checksum_df

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        row = checksum_df(batch_df).collect()[0]
        c = Checksum(row["crc_xor"] or 0, row["total_bytes"] or 0, row["total_kvs"])
        out.append(c if not out else out.pop().add(c))

    return (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
