"""Event-analytics pack 3 (round 13):

- ``events_seasonal_anomaly``: weekday-seasonality anomaly detection —
  the day-over-baseline monitor every event pipeline runs: daily counts
  per event type, a weekday-mean baseline (Mondays compare to Mondays),
  and a multiplicative deviation flag. Deviation is computed from EXACT
  integer sums only (n*k/S with n,k,S longs — no float accumulation
  order anywhere), so it replays bit-exactly; the weekday key is
  datediff-mod-7 from a fixed anchor (portable across engines, unlike
  dayofweek()'s differing conventions).

Scale shape: one raw scan to (event_type, day) counts; everything after
is calendar-grain (types x days rows) — the same posture as the
gap-fill tier. No windows, no joins beyond the weekday-baseline
broadcast-sized equi-join.

Reference parity: none (no event-analytics surface in the reference —
SURVEY.md §2.12 gap families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from .registry import register

#: multiplicative deviation gates: a day is anomalous when its count is
#: >= HI x its weekday mean or <= LO x it (evaluated on the 6dp-rounded
#: ratio so both engines gate on identical values)
_HI, _LO = 1.5, 0.5


@register(
    "events_seasonal_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ), keyed AS (
      SELECT *,
             ((datediff('day', DATE '2024-01-01', day)) % 7 + 7) % 7 AS wd
      FROM daily
    ), base AS (
      SELECT event_type, wd,
             CAST(sum(n) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS k
      FROM keyed GROUP BY event_type, wd
    )
    SELECT d.event_type, d.day, d.n,
           (floor(b.s * 1.0 / b.k * 1000000.0 + 0.5) / 1000000.0)
             AS wd_mean,
           (floor(d.n * b.k * 1.0 / b.s * 1000000.0 + 0.5) / 1000000.0)
             AS ratio,
           ((floor(d.n * b.k * 1.0 / b.s * 1000000.0 + 0.5) / 1000000.0)
              >= {_HI}
            OR
            (floor(d.n * b.k * 1.0 / b.s * 1000000.0 + 0.5) / 1000000.0)
              <= {_LO}) AS is_anomaly
    FROM keyed d JOIN base b ON d.event_type = b.event_type AND d.wd = b.wd
    ORDER BY d.event_type, d.day
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-seasonal deviation monitor over daily event counts: each
    (event_type, day) compares to the mean of its weekday peers;
    6dp-rounded multiplicative ratio, flagged outside [{lo}, {hi}].
    All values derive from exact long sums (n*k/S), so no float
    accumulation order exists to drift.""".format(lo=_LO, hi=_HI)
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    keyed = daily.withColumn(
        "wd", F.pmod(F.datediff("day", F.lit("2024-01-01").cast("date")), F.lit(7))
    )
    base = keyed.groupBy("event_type", "wd").agg(
        F.sum("n").alias("s"), F.count(F.lit(1)).alias("k")
    )
    ratio = hround(F.col("n") * F.col("k") / F.col("s"), 6)
    return (
        keyed.join(base, ["event_type", "wd"])
        .select(
            "event_type",
            "day",
            "n",
            hround(F.col("s") / F.col("k"), 6).alias("wd_mean"),
            ratio.alias("ratio"),
            ((ratio >= F.lit(_HI)) | (ratio <= F.lit(_LO))).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )
