"""Round-9 sketch operators: exact heavy hitters (Misra-Gries candidates
+ verify scan) and the mergeable equi-width histogram quantile sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import sketches


def test_heavy_hitters_exact_matches_groupby(spark, sf_dir):
    """Distributed MG + verify == plain exact GROUP BY ... HAVING, on the
    fixture (capacity above the distinct count: lossless path)."""
    ev = table(spark, sf_dir, "events")
    got = {
        (r.value, r.cnt)
        for r in sketches.heavy_hitters_exact(
            ev, "user_id", min_freq=75, capacity=2048
        ).collect()
    }
    exp = {
        (r.user_id, r.cnt)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 75)
        .collect()
    }
    assert got == exp and got


def test_heavy_hitters_survive_adversarial_spread_with_tiny_capacity(spark):
    """The MG completeness bound under stress: a planted heavy key spread
    EVENLY across partitions (the worst case for per-partition summaries)
    plus a long tail of unique keys, with capacity far below the distinct
    count. Any key with global count > N/(capacity+1) must be found with
    its exact count."""
    # 8 partitions x (40 heavy occurrences + 300 unique tail keys)
    n_part = 8
    heavy_per_part, tail_per_part = 40, 300
    rows = []
    for p in range(n_part):
        rows += [("HEAVY",)] * heavy_per_part
        rows += [(f"tail-{p}-{i}",) for i in range(tail_per_part)]
    df = spark.createDataFrame(rows, "k string").repartition(n_part)
    n = len(rows)
    capacity = 16  # << 2400+ distinct keys: the lossy decrement path runs
    min_freq = heavy_per_part * n_part  # 320 > N/(cap+1) = 2720/17 = 160
    assert min_freq > n / (capacity + 1)
    got = {
        (r.value, r.cnt)
        for r in sketches.heavy_hitters_exact(
            df, "k", min_freq=min_freq, capacity=capacity
        ).collect()
    }
    assert got == {("HEAVY", heavy_per_part * n_part)}


def test_mg_candidates_bounded_output(spark):
    """The candidate table is bounded by capacity x partitions even when
    the key space is much larger, and lb never exceeds the true count."""
    df = spark.createDataFrame(
        [(f"k{i % 500}",) for i in range(5000)], "k string"
    ).repartition(4)
    cands = sketches.mg_candidates(df, "k", capacity=32).collect()
    assert len(cands) <= 32 * 4
    true = {
        r.k: r.cnt
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in cands:
        assert 0 < r.lb <= true[r.value]


def test_histogram_quantiles_error_bounded_and_mergeable(spark, sf_dir):
    """Estimates land within one bin width of the exact quantiles, and a
    sketch merged from two disjoint shards equals the single-build sketch
    cell-for-cell (union+sum mergeability — the CMS property)."""
    li = table(spark, sf_dir, "lineitem")
    n_bins = 1024
    sk = sketches.histogram_build(li, "l_extendedprice", n_bins=n_bins)
    lo, hi = li.agg(
        F.min(F.col("l_extendedprice").cast("double")),
        F.max(F.col("l_extendedprice").cast("double")),
    ).collect()[0]
    bin_width = (hi - lo) / n_bins
    probs = [0.25, 0.5, 0.9]
    got = {
        r.p: r.q
        for r in sketches.histogram_quantiles(sk, probs, n_bins=n_bins).collect()
    }
    exact = dict(
        zip(
            probs,
            li.stat.approxQuantile("l_extendedprice", probs, 0.0),  # exact at rel=0
        )
    )
    for p in probs:
        assert abs(got[p] - exact[p]) <= bin_width + 1e-9, (p, got[p], exact[p])

    # mergeability: two disjoint shards built with the agreed GLOBAL
    # geometry (lo, hi injected) must merge (union+sum) to the exact
    # cell table of the single build
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    merged = sketches.histogram_merge(
        sketches.histogram_build(a, "l_extendedprice", n_bins=n_bins, lo=lo, hi=hi),
        sketches.histogram_build(b, "l_extendedprice", n_bins=n_bins, lo=lo, hi=hi),
    )
    full = {(r.bin, r.c) for r in sk.collect()}
    assert {(r.bin, r.c) for r in merged.collect()} == full


def test_histogram_degenerate_single_value(spark):
    """hi == lo: everything lands in bin 0 and every quantile is the
    value itself (no divide-by-zero)."""
    df = spark.createDataFrame([(7.5,)] * 100, "x double")
    sk = sketches.histogram_build(df, "x", n_bins=64)
    rows = sk.collect()
    assert [(r.bin, r.c) for r in rows] == [(0, 100)]
    got = sketches.histogram_quantiles(sk, [0.5], n_bins=64).collect()
    assert got[0].q == 7.5
