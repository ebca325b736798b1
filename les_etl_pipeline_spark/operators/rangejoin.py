"""Range (interval) join: point-in-interval and interval-overlap joins
without the BroadcastNestedLoop trap.

SURVEY.md §2.12 lists range joins among the engine surface gaps. A naive
``l.join(r, (r.lo <= l.ts) & (l.ts <= r.hi))`` has no equi-key, so Spark
plans a BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a single
broadcast side that must fit in memory; at 100 TB it never finishes.

The scale path implemented here is bin bucketing (the same trick Databricks
exposes as a range-join hint, and Flink/kdb use for as-of/window joins):

- pick a ``bin_width`` comparable to typical interval length;
- each point lands in exactly one bin (``floor(ts / w)``);
- each interval explodes to the bins it covers (``sequence(floor(lo/w),
  floor(hi/w))`` — short arrays when w ≈ interval length);
- equi-join on the bin key (shuffle/broadcast hash join, AQE-eligible),
  then re-check the exact range predicate.

Every point matches an interval in exactly one of the interval's bins, so
no dedup is needed. Cost: |R| × (avg interval length / w) replicated rows
versus a quadratic nested loop — the knob trades replication against
per-bin fanout, and either side can still be broadcast if small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bin_of(df: DataFrame, colname: str, width: int) -> Column:
    """Bin id for a point/bound column: epoch seconds for temporal types
    (date/timestamp/timestamp_ntz), plain value for numeric — any
    monotonic mapping works since the exact predicate re-checks ranges."""
    c = F.col(colname)
    dt = df.schema[colname].dataType
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        num = F.unix_seconds(c.cast("timestamp"))
    else:
        num = c
    return F.floor(num / F.lit(width)).cast("long")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= ts <= hi.

    ``bin_width`` is in SECONDS for ALL temporal types (date, timestamp,
    timestamp_ntz — ``_bin_of`` converts every temporal column through
    ``unix_seconds``, so a 30-day bin is ``30 * 86400``), and in the
    column's own units for numeric types. Intervals where hi < lo are
    dropped (empty range). ``how='left'`` keeps unmatched points
    (interval columns NULL).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"point_in_interval_join supports inner/left, not {how!r}")
    # Surrogate row id BEFORE binning: the left-outer "unmatched points"
    # anti-join must key on something null-safe — anti-joining on all
    # point columns would re-emit any matched row that carries a NULL.
    points = points.withColumn("_pid", F.monotonically_increasing_id())
    p = points.withColumn("_bin", _bin_of(points, ts_col, bin_width))
    iv = (
        intervals.where(F.col(lo_col) <= F.col(hi_col))
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    _bin_of(intervals, lo_col, bin_width),
                    _bin_of(intervals, hi_col, bin_width),
                )
            ),
        )
    )
    on_exact = (F.col(lo_col) <= F.col(ts_col)) & (F.col(ts_col) <= F.col(hi_col))
    joined = p.join(iv, ["_bin"], "inner").where(on_exact).drop("_bin")
    if how == "inner":
        return joined.drop("_pid")
    # left: re-attach points that matched nothing, keyed by surrogate id
    matched_ids = joined.select("_pid")
    unmatched = points.join(matched_ids, ["_pid"], "left_anti")
    for c in intervals.columns:
        if c not in points.columns:
            unmatched = unmatched.withColumn(c, F.lit(None))
    return joined.unionByName(unmatched).drop("_pid")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
) -> DataFrame:
    """Join interval pairs that overlap: max(lo) <= min(hi).

    Both sides explode to covered bins; overlapping intervals share at
    least one bin. Unlike the point case a pair can share several bins,
    so matches are restricted to the FIRST shared bin (the bin of the
    overlap start) — one match per pair without a distinct."""
    l_b = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _bin_of(left, left_lo, bin_width), _bin_of(left, left_hi, bin_width)
            )
        ),
    )
    r_b = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _bin_of(right, right_lo, bin_width), _bin_of(right, right_hi, bin_width)
            )
        ),
    )
    overlap = (F.greatest(F.col(left_lo), F.col(right_lo))
               <= F.least(F.col(left_hi), F.col(right_hi)))
    temporal = isinstance(
        left.schema[left_lo].dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)
    )
    start = F.greatest(F.col(left_lo), F.col(right_lo))
    start_num = F.unix_seconds(start.cast("timestamp")) if temporal else start
    first_shared = F.floor(start_num / F.lit(bin_width)).cast("long")
    return (
        l_b.join(r_b, ["_bin"], "inner")
        .where(overlap & (F.col("_bin") == first_shared))
        .drop("_bin")
    )
