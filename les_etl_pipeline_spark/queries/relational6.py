"""Fourth relational pack: reshaping and matching surface — unpivot
(melt), blocked fuzzy string join, and time-series resampling with gap
fill.

Plan notes (100 TB posture):
- unpivot: projection-only (Expand node) — N measure columns become N
  rows per input row with NO shuffle; the following groupBy is the only
  exchange and its domain is (flag x measure) = tiny.
- fuzzy join: equi-join on a blocking key with levenshtein as residual
  — never a nested loop; see operators/fuzzyjoin.py.
- resample: counts shuffle on (hour-bucket, type) — time-domain-sized,
  not data-sized; the gap spine is sequence() off a 1-row min/max agg,
  broadcast to the left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators.fuzzyjoin import blocked_levenshtein_join
from .registry import register


@register(
    "unpivot_lineitem_measures",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    SELECT l_returnflag, measure,
           count(*) AS n,
           (floor((sum(value)) * 100.0 + 0.5) / 100.0) AS total
    FROM m GROUP BY l_returnflag, measure
    ORDER BY l_returnflag, measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape (melt): the four lineitem measures unpivot to
    (measure, value) rows, then aggregate per (returnflag, measure).
    Spark plans unpivot as an Expand projection — 4x rows but ZERO
    shuffle; the only exchange is the final tiny-domain groupBy. (The
    UNION-ALL spelling an engine without unpivot needs would scan
    lineitem four times.)"""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            hround(F.sum("value")).alias("total"),
        )
        .orderBy("l_returnflag", "measure")
    )


@register(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS left_name, b.p_name AS right_name,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance
    FROM names a JOIN names b
      ON string_split_regex(a.p_name, '\\s+')[-1] = string_split_regex(b.p_name, '\\s+')[-1]
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY left_name, right_name
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-match over part names: pairs within edit distance 3,
    blocked on the last token (any close pair of 'adjective noun' names
    shares the noun). Equi-join + residual levenshtein — no cartesian;
    see operators/fuzzyjoin.py for the 100 TB posture."""
    part = table(spark, sf_dir, "part")
    pairs = blocked_levenshtein_join(
        part, part, "p_name", "p_name", max_distance=3
    ).where(F.col("left_name") < F.col("right_name"))
    return pairs.orderBy("left_name", "right_name")


@register(
    "events_hourly_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT spine.bucket AS bucket, types.event_type AS event_type,
           CAST(coalesce(counts.n, 0) AS BIGINT) AS n
    FROM spine CROSS JOIN types
    LEFT JOIN counts ON counts.bucket = spine.bucket
                    AND counts.event_type = types.event_type
    ORDER BY spine.bucket, types.event_type
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: hourly event counts per type,
    with zero rows for silent hours (the dense spine a forecasting or
    anomaly job needs). The spine is sequence() off a 1-row min/max agg
    and is time-domain-sized — it broadcasts to the left join; the
    count agg is the only data-sized shuffle."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    counts = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(F.broadcast(counts), ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("bucket", "event_type")
    )
