"""Bin-bucketed range join == the naive theta join, without the
BroadcastNestedLoop plan (operators/rangejoin.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


def _points(spark):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.5, 3.0, 7.9, 8.0, 15.0, 23.5])],
        "pid int, ts double",
    )


def _intervals(spark):
    return spark.createDataFrame(
        [(100, 0.0, 4.0), (101, 3.5, 8.0), (102, 20.0, 30.0), (103, 9.0, 5.0)],
        "iid int, lo double, hi double",
    )


def test_point_in_interval_matches_theta(spark):
    pts, iv = _points(spark), _intervals(spark)
    got = point_in_interval_join(pts, iv, "ts", "lo", "hi", bin_width=2)
    naive = pts.join(iv, (F.col("lo") <= F.col("ts")) & (F.col("ts") <= F.col("hi")))
    cols = ["pid", "iid"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, naive.select(cols).collect())
    )
    # empty interval (hi < lo) never matches
    assert got.where(F.col("iid") == 103).count() == 0


def test_point_in_interval_left_keeps_unmatched(spark):
    pts, iv = _points(spark), _intervals(spark)
    got = point_in_interval_join(pts, iv, "ts", "lo", "hi", bin_width=2, how="left")
    # ts=15.0 matches nothing -> kept once with NULL interval columns
    row = got.where(F.col("pid") == 4).collect()
    assert len(row) == 1 and row[0]["iid"] is None
    # matched points appear once per matching interval, plus no extras
    naive_n = pts.join(
        iv, (F.col("lo") <= F.col("ts")) & (F.col("ts") <= F.col("hi"))
    ).count()
    unmatched_n = got.where(F.col("iid").isNull()).count()
    assert got.count() == naive_n + unmatched_n


def test_point_in_interval_no_bnlj_plan(spark):
    pts, iv = _points(spark), _intervals(spark)
    plan = point_in_interval_join(
        pts, iv, "ts", "lo", "hi", bin_width=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan


def test_interval_overlap_matches_theta_no_dupes(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.0), (3, 40.0, 50.0)], "lid int, a_lo double, a_hi double"
    )
    right = spark.createDataFrame(
        [(7, 9.0, 20.0), (8, 0.0, 100.0), (9, 11.0, 12.0)], "rid int, b_lo double, b_hi double"
    )
    got = interval_overlap_join(left, right, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=3)
    naive = left.join(
        right,
        F.greatest(F.col("a_lo"), F.col("b_lo")) <= F.least(F.col("a_hi"), F.col("b_hi")),
    )
    cols = ["lid", "rid"]
    got_pairs = sorted(map(tuple, got.select(cols).collect()))
    assert got_pairs == sorted(map(tuple, naive.select(cols).collect()))
    assert len(got_pairs) == len(set(got_pairs)), "one row per overlapping pair"


def test_interval_overlap_temporal(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-10 00:00:00")],
        "lid int, a_lo string, a_hi string",
    ).select("lid", F.col("a_lo").cast("timestamp"), F.col("a_hi").cast("timestamp"))
    right = spark.createDataFrame(
        [(7, "2024-01-09 00:00:00", "2024-02-01 00:00:00"),
         (8, "2024-03-01 00:00:00", "2024-03-02 00:00:00")],
        "rid int, b_lo string, b_hi string",
    ).select("rid", F.col("b_lo").cast("timestamp"), F.col("b_hi").cast("timestamp"))
    got = interval_overlap_join(
        left, right, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=86400
    )
    assert [(r["lid"], r["rid"]) for r in got.collect()] == [(1, 7)]
