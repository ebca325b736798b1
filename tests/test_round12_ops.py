"""Round-12 operator tests: fail-loud completeness guards on the
capacity-parameterized exact heavy-hitter family (VERDICT r11 #2 /
ADVICE r11), the sliding pane-merge extraction, and the d>=3 skyline.

The guard contract under test: when min_freq <= N/(capacity+1) (per
scope — global, group, or trailing window), the operator must ABORT the
job with a sizing message rather than silently drop a qualifying heavy
hitter; when the bound holds, output must be bit-identical to the
unchecked (check_bound=False) form. The undersized cases are built so
the damaged result would be EMPTY or missing the affected scope — the
one shape a result-row flag could never surface — proving the raise
branch fires independently of the output rows.
"""

from __future__ import annotations

import datetime as dt

import pytest

from les_etl_pipeline_spark.operators import sketches


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


# -- fail-loud MG completeness guards (VERDICT r11 #2) ------------------------
def test_hh_exact_guard_raises_on_undersized_capacity(spark):
    # N=280, capacity=4 -> N/(cap+1)=56 >= min_freq=10: bound violated.
    rows = [("a",)] * 50 + [("b",)] * 30 + [(f"t{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    bad = sketches.heavy_hitters_exact(df, "v", min_freq=10, capacity=4)
    with pytest.raises(Exception, match="completeness bound violated"):
        bad.collect()


def test_hh_exact_guard_ok_path_bit_matches_unchecked(spark):
    # N=280, capacity=64 -> bound 4.3 < 10: guard must be a no-op.
    rows = [("a",)] * 50 + [("b",)] * 30 + [(f"t{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    ok = sketches.heavy_hitters_exact(df, "v", min_freq=10, capacity=64)
    un = sketches.heavy_hitters_exact(
        df, "v", min_freq=10, capacity=64, check_bound=False
    )
    got = _collect_sorted(ok)
    assert got == _collect_sorted(un)
    assert got == [("a", 50), ("b", 30)] or got == [("a", 50), ("b", 30)][::-1] or got == sorted([("a", 50), ("b", 30)])


def test_hh_grouped_guard_raises_per_group_and_names_the_group(spark):
    # group g: N_g=300, capacity=8 -> 33.3 >= 20 violated; group h fine.
    rows = (
        [("g", "a")] * 100
        + [("g", f"t{i}") for i in range(200)]
        + [("h", "b")] * 20
    )
    df = spark.createDataFrame(rows, "grp string, v string").repartition(4)
    bad = sketches.heavy_hitters_exact_grouped(
        df, ["grp"], "v", min_freq=20, capacity=8
    )
    with pytest.raises(Exception, match="completeness bound"):
        bad.collect()
    ok = sketches.heavy_hitters_exact_grouped(
        df, ["grp"], "v", min_freq=20, capacity=64
    )
    un = sketches.heavy_hitters_exact_grouped(
        df, ["grp"], "v", 20, 64, check_bound=False
    )
    got = _collect_sorted(ok)
    assert got == _collect_sorted(un)
    assert got == [("g", "a", 100), ("h", "b", 20)]


def test_hh_sliding_guard_raises_on_undersized_window(spark):
    d0 = dt.date(2024, 1, 1)
    rows = []
    for dd in range(6):
        day = d0 + dt.timedelta(days=dd)
        rows += [(day, "hot")] * 10 + [(day, f"t{dd}_{i}") for i in range(40)]
    sdf = spark.createDataFrame(rows, "day date, v string").repartition(3)
    bad = sketches.heavy_hitters_sliding(
        sdf, "day", "v", min_freq=25, window_days=3, capacity=2
    )
    with pytest.raises(Exception, match="completeness bound"):
        bad.collect()
    ok = sketches.heavy_hitters_sliding(
        sdf, "day", "v", min_freq=25, window_days=3, capacity=64
    )
    un = sketches.heavy_hitters_sliding(
        sdf, "day", "v", 25, 3, 64, check_bound=False
    )
    got = _collect_sorted(ok)
    assert got == _collect_sorted(un)
    # trailing 3-day windows: anchors 2024-01-03..06 see 3 full hot panes
    assert [(str(d), v, c) for d, v, c in got] == [
        ("2024-01-0%d" % a, "hot", 30) for a in (3, 4, 5, 6)
    ]


def test_hh_guard_fires_even_when_result_would_be_empty(spark):
    """The decisive shape: capacity so small the MG summary loses the
    only qualifying value entirely -> without the guard the output is
    silently EMPTY (the worst failure mode); with it the job aborts."""
    # Two values tied at 12 plus a 9x tail: MG with capacity 1 keeps
    # only values STRICTLY above the 2nd-largest count, so the tie
    # drops BOTH true heavy hitters and the candidate set is empty.
    rows = (
        [("hot1",)] * 12
        + [("hot2",)] * 12
        + [(f"t{i}",) for i in range(20) for _ in range(9)]
    )
    df = spark.createDataFrame(rows, "v string").coalesce(1)
    un = sketches.heavy_hitters_exact(
        df, "v", min_freq=12, capacity=1, check_bound=False
    )
    assert un.count() == 0  # the silent drop the guard exists to catch
    bad = sketches.heavy_hitters_exact(df, "v", min_freq=12, capacity=1)
    with pytest.raises(Exception, match="completeness bound violated"):
        bad.collect()


def test_mg_totals_markers_sum_to_exact_n(spark):
    rows = [(f"v{i % 7}",) for i in range(123)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "v string").repartition(3)
    summ = sketches.mg_candidates(df, "v", capacity=4, emit_totals=True)
    from pyspark.sql import functions as F

    n = (
        summ.where(F.col("value").isNull())
        .agg(F.sum("lb").alias("n"))
        .collect()[0]["n"]
    )
    assert n == 123  # nulls excluded, exact non-null count
    # default emit_totals=False keeps the legacy marker-free schema
    legacy = sketches.mg_candidates(df, "v", capacity=4)
    assert legacy.where(F.col("value").isNull()).count() == 0


# -- sliding pane-merge extraction (VERDICT r11 #4) ---------------------------
def test_sliding_pane_merge_property_widths(spark):
    """For any window width, pane-merge of daily sums == the naive
    per-anchor re-scan; width 1 is the identity. Gap days (missing from
    the daily frame) must not anchor windows, but their absence must not
    break neighbours' windows either."""
    import datetime as dt

    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.operators import panes

    d0 = dt.date(2024, 3, 1)
    # 40 days with gaps (no data on every 5th day), value = day index
    daily_rows = [
        (d0 + dt.timedelta(days=i), i + 1) for i in range(40) if i % 5 != 0
    ]
    daily = spark.createDataFrame(daily_rows, "day date, c long")
    present = {d for d, _ in daily_rows}
    by_day = dict(daily_rows)
    for w in (1, 7, 30):
        got = {
            (r.day, r.s)
            for r in panes.sliding_pane_merge(
                daily,
                "day",
                w,
                lambda p: p.groupBy("day7").agg(F.sum("c").alias("s")),
            )
            .select(F.col("day7").alias("day"), "s")
            .collect()
        }
        want = {
            (a, sum(by_day.get(a - dt.timedelta(days=j), 0) for j in range(w)))
            for a in present
        }
        assert got == want, f"width {w}"
    # width 1 is the identity on the daily frame
    ident = panes.sliding_pane_merge(
        daily, "day", 1, lambda p: p.groupBy("day7").agg(F.sum("c").alias("s"))
    )
    assert {(r.day7, r.s) for r in ident.collect()} == set(daily_rows)


def test_sliding_panes_null_days_and_explicit_anchors(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.operators import panes

    d0 = dt.date(2024, 3, 1)
    daily = spark.createDataFrame(
        [(d0, 1), (None, 99), (d0 + dt.timedelta(days=1), 2)], "day date, c long"
    )
    # null day neither contributes panes nor anchors a window
    out = panes.sliding_pane_merge(
        daily, "day", 7, lambda p: p.groupBy("day7").agg(F.sum("c").alias("s"))
    ).collect()
    assert sorted((r.day7, r.s) for r in out) == [
        (d0, 1),
        (d0 + dt.timedelta(days=1), 3),
    ]
    # explicit anchors: a day absent from the daily frame can anchor
    anchors = spark.createDataFrame(
        [(d0 + dt.timedelta(days=3),)], "day date"
    )
    out2 = panes.sliding_pane_merge(
        daily,
        "day",
        7,
        lambda p: p.groupBy("day7").agg(F.sum("c").alias("s")),
        anchors=anchors,
    ).collect()
    assert [(r.day7, r.s) for r in out2] == [(d0 + dt.timedelta(days=3), 3)]


# -- d>=3 skyline (VERDICT r11 #6) --------------------------------------------
def test_skyline_nd_matches_naive_with_ties_nulls_and_groups(spark):
    """The general-d operator vs the quadratic definition on random
    integer points with exact ties, a NULL group, NULL criteria, and
    several partition layouts (phase-1 completeness is layout-free)."""
    import random

    from les_etl_pipeline_spark.operators.skyline import skyline

    random.seed(7)
    rows = [
        (
            i,
            random.choice(["g", "h", None]),
            random.randint(0, 8),
            random.randint(0, 8),
            random.randint(0, 8),
        )
        for i in range(300)
    ]
    # exact tie on an undominatable point (a below, b/c above the random
    # range): dominance needs a strict edge somewhere, so BOTH survive
    rows += [(1000, "g", -1, 9, 9), (1001, "g", -1, 9, 9)]
    rows += [(1002, "g", None, 9, 9)]  # NULL criterion: excluded
    df = spark.createDataFrame(rows, "id long, grp string, a long, b long, c long")

    def naive(grouped):
        out = []
        valid = [r for r in rows if r[2] is not None]
        for r in valid:
            dom = False
            for s in valid:
                if grouped and s[1] != r[1]:
                    continue
                if (
                    s[2] <= r[2]
                    and s[3] >= r[3]
                    and s[4] >= r[4]
                    and (s[2] < r[2] or s[3] > r[3] or s[4] > r[4])
                ):
                    dom = True
                    break
            if not dom:
                out.append(r[0])
        return sorted(out)

    for nparts in (1, 5, 13):
        d = df.repartition(nparts)
        got = sorted(r.id for r in skyline(d, ["a"], ["b", "c"]).collect())
        assert got == naive(False), f"ungrouped, {nparts} parts"
        gotg = sorted(
            r.id for r in skyline(d, ["a"], ["b", "c"], group_cols=["grp"]).collect()
        )
        assert gotg == naive(True), f"grouped, {nparts} parts"
    # the tie pair survives, the NULL-criterion row does not
    assert 1000 in naive(True) and 1001 in naive(True)


def test_skyline_nd_d1_degenerates_to_min(spark):
    from les_etl_pipeline_spark.operators.skyline import skyline

    rows = [(1, 5), (2, 3), (3, 3), (4, 9)]
    df = spark.createDataFrame(rows, "id long, a long").repartition(2)
    got = sorted(r.id for r in skyline(df, ["a"], []).collect())
    assert got == [2, 3]


# -- time-series gap-fill (round 12) ------------------------------------------
def test_gapfill_daily_matches_naive(spark):
    """LOCF + linear interpolation vs a naive python fill on a
    multi-series frame with single and multi-day interior gaps, a
    single-observation series, and a NULL day row (excluded)."""
    import datetime as dt

    from les_etl_pipeline_spark.operators import timeseries

    d = lambda i: dt.date(2024, 5, 1) + dt.timedelta(days=i)
    rows = [
        ("a", d(0), 10),
        ("a", d(1), 20),
        ("a", d(4), 50),   # 2-day interior gap
        ("a", d(5), 10),
        ("a", d(9), 2),    # 3-day interior gap
        ("b", d(2), 7),    # single-observation series: calendar = 1 day
        ("c", d(0), 4),
        ("c", d(2), 6),
        ("c", None, 99),   # NULL day: excluded by contract
    ]
    df = spark.createDataFrame(rows, "s string, day date, v long").repartition(3)
    out = timeseries.gapfill_daily(df, ["s"], "day", "v")
    got = {
        (r.s, r.day): (r.v, r.locf, r.interp) for r in out.collect()
    }

    def naive():
        series = {}
        for s, day, v in rows:
            if day is not None:
                series.setdefault(s, {})[day] = v
        exp = {}
        for s, obs in series.items():
            days = sorted(obs)
            cur = days[0]
            while cur <= days[-1]:
                v = obs.get(cur)
                prevs = [x for x in days if x <= cur and x in obs]
                nexts = [x for x in days if x >= cur and x in obs]
                pd_, nd_ = max(prevs), min(nexts)
                locf = obs[pd_]
                if v is not None:
                    interp = float(v)
                else:
                    span = (nd_ - pd_).days
                    into = (cur - pd_).days
                    interp = obs[pd_] + (obs[nd_] - obs[pd_]) * (into / span)
                exp[(s, cur)] = (v, locf, interp)
                cur += dt.timedelta(days=1)
        return exp

    exp = naive()
    assert set(got) == set(exp)
    for k in exp:
        ev, el, ei = exp[k]
        gv, gl, gi = got[k]
        assert gv == ev and gl == el and abs(gi - ei) < 1e-12, (k, got[k], exp[k])
    # prev/next day bounds are surfaced for window-limited fills
    cols = set(out.columns)
    assert {"prev_day", "next_day"} <= cols


def test_gapfill_surfaced_bounds_enable_window_limited_fill(spark):
    """The documented use of prev_day/next_day: a caller caps how far a
    fill may stretch (e.g. LOCF valid for at most 2 days) with a plain
    column predicate — no operator change needed."""
    import datetime as dt

    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.operators import timeseries

    d = lambda i: dt.date(2024, 5, 1) + dt.timedelta(days=i)
    rows = [("a", d(0), 10), ("a", d(1), 20), ("a", d(7), 50)]  # 5-day gap
    df = spark.createDataFrame(rows, "s string, day date, v long")
    out = timeseries.gapfill_daily(df, ["s"], "day", "v").withColumn(
        "locf_capped",
        F.when(F.datediff("day", "prev_day") <= 2, F.col("locf")),
    )
    got = {r.day: r.locf_capped for r in out.collect()}
    assert got[d(2)] == 20 and got[d(3)] == 20  # within 2 days of d(1)
    assert got[d(4)] is None and got[d(6)] is None  # stale fill suppressed
    assert got[d(7)] == 50  # observed day unaffected
