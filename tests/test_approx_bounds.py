"""Accuracy bounds for the rows-only approximate queries.

The driver cannot oracle-check sketch results (CORRECTNESS records them
as no_oracle), so the repo bounds them here instead, driving the SAME
registered queries the driver grades:

- agg_approx_count_distinct: HyperLogLog++ at rsd=0.01 — estimate within
  5x the configured relative standard deviation of the exact per-group
  count (≈5 sigma; HLL++'s published error is the rsd parameter).
- agg_approx_percentiles: GK/KLL-style percentile_approx at
  accuracy=10000 — the published guarantee is a RANK error of at most
  N/accuracy, and the returned value is an element of the group, so the
  bound is checked in rank space per group and percentile.

Mirrors the recall bound pattern of tests/test_similarity_ivf.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.queries import QUERIES


def test_approx_count_distinct_bounds_per_group(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in QUERIES["agg_approx_count_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, ex in exact.items():
        rel_err = abs(approx[k] - ex) / ex
        assert rel_err <= 5 * 0.01, f"group {k}: rel err {rel_err:.4f} > 5*rsd"


def test_approx_percentiles_rank_bounds(spark, sf_dir):
    out = {
        r["l_returnflag"]: (r["p50"], r["p95"], r["p99"])
        for r in QUERIES["agg_approx_percentiles"](spark, sf_dir).collect()
    }
    groups = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sort_array(F.collect_list("l_extendedprice")).alias("vals"))
        .collect()
    )
    accuracy = 10000  # matches the registered query
    for row in groups:
        vals = row["vals"]
        n = len(vals)
        tol = n / accuracy + 1  # published rank-error bound (+1 discreteness)
        for p, v in zip((0.5, 0.95, 0.99), out[row["l_returnflag"]]):
            # returned value must be an actual element of the group (GK
            # sketches return observed values, not interpolations)
            assert v in vals
            lo = sum(1 for x in vals if x < v)  # min rank of v (0-based)
            hi = sum(1 for x in vals if x <= v)  # max rank of v
            target = p * n
            assert lo - tol <= target <= hi + tol, (
                f"{row['l_returnflag']} p{int(p*100)}: target rank "
                f"{target:.0f} outside [{lo - tol:.0f}, {hi + tol:.0f}] (n={n})"
            )


def test_hll_sketch_union_consistency(spark, sf_dir):
    """The HLL sketch query's estimates must sit within the configured
    relative error of exact distinct counts, and the TOTAL row — built
    by UNIONING the per-group sketches, never rescanning — must agree
    with the exact global distinct count (the mergeability property that
    makes sketches composable across partitions at scale)."""
    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.queries import QUERIES

    out = {
        r["l_returnflag"]: r["distinct_parts_est"]
        for r in QUERIES["agg_hll_sketch_union"](spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    exact["TOTAL"] = li.select("l_partkey").distinct().count()
    assert set(out) == set(exact)
    for k, est in out.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])
