"""Round-13 fixes: skyline NaN-criterion exclusion + phase-2 candidate
bound, sliding_panes anchor collision, gapfill NULL-value contract."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from les_etl_pipeline_spark.operators import panes, skyline as sky, timeseries


# -- skyline: NaN criteria excluded (ADVICE r12 #1) ---------------------------
def test_skyline_nd_excludes_nan_criteria(spark):
    """A NaN double criterion passes isNotNull but compares False
    against everything in the numpy phase — un-excluded it would always
    survive. Contract: NaN rows are excluded like NULL rows."""
    rows = [
        (1, 1.0, 1.0, 10.0),
        (2, 2.0, 2.0, 5.0),  # dominated by row 1
        (3, float("nan"), 0.5, 99.0),  # NaN criterion: excluded
        (4, 0.5, float("nan"), 99.0),  # NaN in second criterion: excluded
        (5, 0.5, 3.0, 1.0),  # survives (cheapest)
    ]
    df = spark.createDataFrame(rows, "id long, a double, b double, c double")
    got = sorted(r.id for r in sky.skyline(df, ["a", "b"], ["c"]).collect())
    assert got == [1, 5]


def test_skyline_2d_excludes_nan_criteria(spark):
    rows = [
        (1, 1.0, 10.0),
        (2, 2.0, 5.0),  # dominated
        (3, float("nan"), 99.0),  # excluded
        (4, 0.5, 1.0),  # survives
    ]
    df = spark.createDataFrame(rows, "id long, mn double, mx double")
    got = sorted(r.id for r in sky.skyline_2d(df, "mn", "mx").collect())
    assert got == [1, 4]


# -- skyline: fail-loud phase-2 candidate bound (VERDICT r12 #2) --------------
def _anticorrelated(spark, n=400):
    """Every row is on the Pareto frontier: minimize a, maximize b with
    b == a. The true skyline (hence phase 2's single task) is Θ(N)."""
    return spark.range(n).select(
        F.col("id"), F.col("id").alias("a"), F.col("id").alias("b"),
        (F.col("id") % 7).alias("c"),
    )


def test_skyline_candidate_bound_raises_on_anticorrelated(spark):
    df = _anticorrelated(spark)
    out = sky.skyline(df, ["a"], ["b", "c"], max_candidates=100)
    with pytest.raises(Exception, match="candidate bound violated"):
        out.collect()


def test_skyline_candidate_bound_grouped_raises(spark):
    df = _anticorrelated(spark).withColumn("g", F.col("id") % 2)
    out = sky.skyline(df, ["a"], ["b", "c"], group_cols=["g"], max_candidates=50)
    with pytest.raises(Exception, match="candidate bound violated"):
        out.collect()


def test_skyline_candidate_bound_passes_under_bound(spark):
    """The guard is inert when the candidate count fits: result is
    identical to the unguarded (max_candidates=None) run — here the
    whole anti-correlated frontier IS the skyline."""
    df = _anticorrelated(spark, n=200)
    got = sorted(
        r.id for r in sky.skyline(df, ["a"], ["b", "c"], max_candidates=10_000).collect()
    )
    ref = sorted(
        r.id for r in sky.skyline(df, ["a"], ["b", "c"], max_candidates=None).collect()
    )
    assert got == ref == list(range(200))


def test_skyline_guard_null_group_key_is_a_group(spark):
    """The guard join is null-safe: rows in the NULL group still pass
    through phase 2 and the per-group bound applies to them too."""
    rows = [(1, None, 1, 10), (2, None, 2, 5), (3, "x", 1, 1)]
    df = spark.createDataFrame(rows, "id long, g string, a long, b long")
    got = sorted(
        r.id
        for r in sky.skyline(
            df, ["a"], ["b"], group_cols=["g"], max_candidates=100
        ).collect()
    )
    assert got == [1, 3]


# -- sliding_panes: anchor collision (ADVICE r12 #2) ---------------------------
def test_sliding_panes_rejects_anchor_collision(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1), 1, 2)], "day date, day7 long, v long"
    )
    with pytest.raises(ValueError, match="collides"):
        panes.sliding_panes(df, "day", 7)
    # a non-colliding anchor name works on the same frame
    out = panes.sliding_panes(df, "day", 7, anchor_col="anchor")
    assert out.count() == 1  # one existing anchor day


def test_sliding_panes_anchor_equal_to_day_col_ok(spark):
    df = spark.createDataFrame([(dt.date(2024, 1, 1), 2)], "day date, v long")
    out = panes.sliding_panes(df, "day", 3, anchor_col="day")
    assert out.columns == ["day", "v"] and out.count() == 1


# -- gapfill: NULL value rows are not observations (ADVICE r12 #4) -------------
def test_gapfill_null_value_rows_are_not_observations(spark):
    """A NULL value on a series' first day must not set the calendar
    bound (it would yield NULL locf/interp inside the support). The row
    is excluded; bounds come from observed (non-null) values only."""
    d = lambda i: dt.date(2024, 5, 1) + dt.timedelta(days=i)
    rows = [
        ("a", d(0), None),  # NULL value: NOT an observation
        ("a", d(2), 10),
        ("a", d(3), None),  # interior NULL value: a gap day, not an obs
        ("a", d(4), 30),
    ]
    df = spark.createDataFrame(rows, "s string, day date, v long")
    out = timeseries.gapfill_daily(df, ["s"], "day", "v")
    got = {r.day: (r.v, r.locf, r.interp) for r in out.collect()}
    assert set(got) == {d(2), d(3), d(4)}  # calendar starts at first obs
    assert got[d(2)] == (10, 10, 10.0)
    assert got[d(3)][0] is None and got[d(3)][1] == 10
    assert math.isclose(got[d(3)][2], 20.0)
    assert got[d(4)] == (30, 30, 30.0)


# -- gapfill: compacting a virgin sink is a no-op (ADVICE r13) -----------------
def test_gapfill_compact_state_before_any_batch_is_noop(spark, tmp_path):
    from les_etl_pipeline_spark.streaming import gapfill as SG

    index_dir = str(tmp_path / "virgin_gf")
    assert SG.compact_state(
        spark, index_dir, ["s"], "day", "v", "s string, day date, v long"
    ) == (0, 0)
    # an index dir that exists but has never drained a batch: same no-op
    import os as _os

    _os.makedirs(index_dir, exist_ok=True)
    assert SG.compact_state(
        spark, index_dir, ["s"], "day", "v", "s string, day date, v long"
    ) == (0, 0)
