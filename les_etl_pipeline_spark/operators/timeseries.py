"""Time-series gap-fill / resampling: calendar densification with
last-observation-carried-forward and linear interpolation — the
hypertable-rollup / ``time_bucket_gapfill`` shape (TimescaleDB,
InfluxDB) the relational surface otherwise lacks. Sensor feeds, daily
KPIs, and training-data telemetry all need "one row per (series, day),
holes filled deterministically" before any window analytics run.

Scale shape: the raw stream is touched ONCE (the daily aggregate); all
densification happens at CALENDAR grain — series x days rows, metadata
scale at any corpus size. Per-series windows are therefore bounded by
the calendar span, never by raw cardinality (a hot series has many rows
per day, not many days), so the plan has no hot-group straggler: the
day-grain partitioned window is the correct tool here, unlike the
value-grain windows the carried-CDF operators exist to avoid.

Semantics (matches the SQL-window replay bit-for-bit):
- The calendar spans each series' OWN [min(day), max(day)] — no series
  is extended past its observed support (classic gapfill; global
  calendars are a caller-side union).
- ``locf``: the last observed value at or before the day; days before a
  series' first observation would be NULL, but per-series bounds mean
  day 1 is always observed.
- ``interp``: linear interpolation between the surrounding observed
  values, exact on observed days (prev == current), NULL only outside
  the support (again impossible under per-series bounds). The division
  is evaluated in the same double order as the SQL replay, so counts-in
  -> bit-stable doubles out.

Reference parity: none (the reference has no time-series surface —
SURVEY.md §2.12 gap families; OLAP-engine staple from the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def gapfill_daily(
    df: DataFrame,
    series_cols: list[str],
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify a (series..., day, value) day-grain frame onto each
    series' own [min(day), max(day)] calendar and fill holes two ways.

    Input must already be day-grain (one row per (series, day) — build
    it with the upstream aggregate so the raw stream is scanned once);
    NULL days are excluded by contract, and so are NULL ``value_col``
    rows — a NULL value is NOT an observation, so it neither sets a
    series' calendar bounds nor anchors a fill (were it kept, a NULL
    value on a series' first day would bound the calendar while
    yielding NULL locf/interp inside the support, breaking the
    never-NULL guarantee below). Returns
    (series..., day, ``value_col`` [NULL on gap days], locf, prev_day,
    next_day, interp) — prev/next day bounds are surfaced so callers can
    window-limit how far a fill may stretch."""
    scols = list(series_cols)
    daily = df.where(F.col(day_col).isNotNull() & F.col(value_col).isNotNull())
    bounds = daily.groupBy(*scols).agg(
        F.min(day_col).alias("_lo"), F.max(day_col).alias("_hi")
    )
    cal = bounds.select(
        *scols, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(day_col)
    )
    dense = cal.join(daily, scols + [day_col], "left")
    w_prev = (
        W.partitionBy(*scols).orderBy(day_col).rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy(*scols).orderBy(day_col).rowsBetween(0, W.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_day = F.when(v.isNotNull(), F.col(day_col))
    out = (
        dense.withColumn("locf", F.last(v, ignorenulls=True).over(w_prev))
        .withColumn("_pv", F.last(v, ignorenulls=True).over(w_prev))
        .withColumn("prev_day", F.last(obs_day, ignorenulls=True).over(w_prev))
        .withColumn("_nv", F.first(v, ignorenulls=True).over(w_next))
        .withColumn("next_day", F.first(obs_day, ignorenulls=True).over(w_next))
    )
    span = F.datediff("next_day", "prev_day").cast("double")
    into = F.datediff(F.col(day_col), F.col("prev_day")).cast("double")
    interp = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(
            F.col("prev_day").isNotNull() & F.col("next_day").isNotNull(),
            F.col("_pv").cast("double")
            + (F.col("_nv").cast("double") - F.col("_pv").cast("double"))
            * (into / span),
        )
    )
    return out.withColumn("interp", interp).drop("_pv", "_nv")
