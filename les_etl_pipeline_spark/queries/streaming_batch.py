"""Event-time windowing over the `events` table — the batch-checkable face
of the streaming surface (SURVEY.md §2.10/§2.12). The same window
expressions run under Structured Streaming in
``les_etl_pipeline_spark.streaming`` (readStream + watermark), which is
covered by rows-only unit tests; here they run in batch so the DuckDB
oracle can verify values.

Window-start columns are emitted as formatted strings so both engines hash
identical values regardless of timestamp physical type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from .registry import register

_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n_events,
           (floor((sum(value)) * 100.0 + 0.5) / 100.0) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            hround(F.sum("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_sliding_window",
    oracle="""
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n_events,
           (floor((avg(value)) * 100.0 + 0.5) / 100.0) AS avg_value
    FROM (
      SELECT time_bucket(INTERVAL 12 HOURS, ts) - k * INTERVAL 12 HOURS AS win_start, value
      FROM events, (VALUES (0), (1)) offsets(k)
    )
    GROUP BY 1
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-day windows sliding every 12h: each event lands in 2 windows
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            hround(F.avg("value")).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("win_start"),
            "n_events",
            "avg_value",
        )
    )


@register(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTES THEN 0 ELSE 1 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           (floor((sum(value)) * 100.0 + 0.5) / 100.0) AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min inactivity): the batch equivalent
    of session_window(ts, '30 minutes') — expressed via the built-in
    session_window function, which Structured Streaming reuses unchanged."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            hround(F.sum("value")).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _FMT).alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "stream_dedup_by_key",
    oracle="""
    SELECT user_id, event_type,
           strftime(min_ts, '%Y-%m-%d %H:%M:%S') AS first_seen
    FROM (SELECT user_id, event_type, min(ts) AS min_ts
          FROM events GROUP BY user_id, event_type)
    """,
)
def stream_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (dropDuplicatesWithinWatermark) batch
    equivalent: first event per (user, type)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("min_ts"))
        .select(
            "user_id",
            "event_type",
            F.date_format("min_ts", _FMT).alias("first_seen"),
        )
    )


@register(
    "stream_late_data_cutoff",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n_events
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY 1
    """,
)
def stream_late_data_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics in batch: events older than (max event time -
    7 days) are dropped before windowed aggregation."""
    ev = table(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
    )
    return (
        ev.join(F.broadcast(cutoff))
        .where(F.col("ts") >= F.col("cutoff"))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("win_start"),
            "n_events",
        )
    )


@register(
    "stream_window_topk",
    oracle="""
    WITH counts AS (
      SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type, count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT win_start, event_type, n_events, CAST(rn AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY win_start
                                       ORDER BY n_events DESC, event_type) AS rn
          FROM counts)
    WHERE rn <= 2 ORDER BY win_start, rnk
    """,
)
def stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k event types per tumbling day window — the trending-topics
    shape: windowed counts then rank within window. In true streaming
    the rank step runs per micro-batch over the emitted window rows
    (foreachBatch); here the batch twin lets DuckDB check values. Both
    aggregations share the window-start key domain."""
    ev = table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    rk = W.partitionBy("win_start").orderBy(F.col("n_events").desc(), "event_type")
    return (
        counts.withColumn("rnk", F.row_number().over(rk))
        .where(F.col("rnk") <= 2)
        .orderBy("win_start", "rnk")
    )
