"""Streaming event pipelines: the same window expressions the batch
queries use (queries/streaming_batch.py), run under Structured Streaming
with watermarks — readStream file source, windowed/sessionized stateful
aggregation, late-data handling, stateful dedup.

The reference is batch-only (its "incrementality" is an Airflow ledger,
SURVEY.md §2.10); this is the engine's streaming face. At scale the file
source becomes Kafka by swapping `readStream.format` — the plan after the
source is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-source event stream. One file per micro-batch by default so
    the watermark advances between batches (availableNow otherwise drains
    everything in a single batch and late-data semantics never engage)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling window counts with late-data cutoff at the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value")
    )


def sliding_averages(events: DataFrame, window: str = "1 hour", slide: str = "30 minutes",
                     watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "avg_value", "n_events")
    )


def session_aggregates(events: DataFrame, gap="30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user (stateful; state store holds
    open sessions until watermark passes). ``gap`` is a duration string
    OR a Column expression of the incoming row (dynamic gap — e.g.
    purchases hold sessions open longer), the same form the batch twin
    events_sessionize_dynamic_gap pins against its oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def deduped_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful exactly-once dedup on event_id within the watermark
    horizon (dropDuplicatesWithinWatermark: state is bounded — the 100 TB
    answer to unbounded dedup state)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_stream_interval_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream join: each purchase joined to the views
    of the same user within ``horizon`` before it (the attribution join).

    Both sides carry watermarks and the join condition bounds the event
    times relative to each other — that pair of constraints is what lets
    Spark expire buffered state instead of holding both streams forever
    (the unbounded-state trap of an unconstrained stream-stream join).
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(v, cond, "inner").select(
        "purchase_id", "purchase_ts", F.col("p_user").alias("user_id"), "view_id", "view_ts"
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drain all available input into an in-memory table (availableNow
    trigger); returns the finished query. Test/debug sink."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_to_lakehouse(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    partition_col: str | None = None,
):
    """foreachBatch sink: each micro-batch appends (optionally
    partitioned) parquet to the lakehouse path — exactly-once per batch
    via the checkpointed batch id. The standard stream->table landing
    pattern; swap .parquet for Delta where available to get ACID appends.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = batch_df.write.mode("append")
        if partition_col is not None:
            w = w.partitionBy(partition_col)
        w.parquet(out_path)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def enrich_with_static(stream_df: DataFrame, dim_df: DataFrame, key: str) -> DataFrame:
    """Stream-static enrichment join — the most common streaming shape:
    each micro-batch of the stream joins a BATCH dimension (no watermark
    needed on either side; the static side is re-evaluated per batch, so
    a dimension refreshed on disk is picked up by later batches). Spark
    broadcasts the static side when it fits — at scale pin the dimension
    small (current SCD2 snapshot, not history) or pre-bucket both sides.
    Inner join: unmatched stream rows drop; use a left join + quarantine
    for audit paths."""
    from pyspark.sql import functions as F

    return stream_df.join(F.broadcast(dim_df), key)


def stream_stream_left_outer_join(
    purchases: DataFrame,
    views: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every purchase emits —
    joined to same-user views within ``horizon`` before it when they
    exist, null-extended otherwise (the unattributed-conversion row an
    attribution pipeline must still count).

    The outer semantics are what make the watermark LOAD-BEARING rather
    than advisory: an unmatched purchase can only be emitted once the
    view-side watermark proves no matching view can still arrive, so the
    null-extended row surfaces when the watermark passes purchase_ts +
    horizon (plus Spark's one-micro-batch eviction lag). Same bounded
    state as the inner form: both sides watermarked, join condition
    time-bounds the buffers."""
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(v, cond, "leftOuter").select(
        "purchase_id",
        "purchase_ts",
        F.col("p_user").alias("user_id"),
        "view_id",
        "view_ts",
    )
