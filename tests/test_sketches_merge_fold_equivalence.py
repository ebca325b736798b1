"""r14 optimization pin: the n-way kll_merge equals the explicit left
fold bit-exactly on asymmetric disjoint shards.

sketch_kll_merge_fold now materializes its three shard builds
concurrently and merges them in ONE kll_merge(*builds) call instead of
the old sequential two-step left fold. The equality argument: the
fold's intermediate floor max(l01, l2) >= max(l0, l1, l2), and for any
level l with max(l0, l1, l2) <= l < l01 the union counts satisfy
c012_l >= c01_l > capacity (disjoint-shard counts add and are
non-negative), so the n-way restricted search and the fold's restricted
search select the same l*. This test pins that argument on the exact
shard split the registered query uses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import sketches

CAPACITY = 64  # small so sf0.001 still compacts several levels


def _shards(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    m = F.col("l_orderkey") % 100
    return [
        sketches.kll_build(s, "l_extendedprice", key, capacity=CAPACITY)
        for s in (
            li.where(m < 90),
            li.where((m >= 90) & (m < 99)),
            li.where(m == 99),
        )
    ]


def test_nway_merge_equals_left_fold(spark, sf_dir):
    builds = [b.localCheckpoint() for b in _shards(spark, sf_dir)]
    nway = sketches.kll_merge(*builds, capacity=CAPACITY)
    folded = builds[0]
    for b in builds[1:]:
        folded = sketches.kll_merge(folded, b, capacity=CAPACITY).localCheckpoint()
    got = sorted(map(tuple, nway.collect()))
    want = sorted(map(tuple, folded.collect()))
    assert got == want
    assert len(got) > 0


def test_nway_merge_equals_single_build(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    builds = [b.localCheckpoint() for b in _shards(spark, sf_dir)]
    nway = sketches.kll_merge(*builds, capacity=CAPACITY)
    single = sketches.kll_build(li, "l_extendedprice", key, capacity=CAPACITY)
    # the merge's defining property, now via the n-way path: (v, u)
    # survivor sets agree with the whole-table single build
    got = sorted((r.v, r.u) for r in nway.collect())
    want = sorted((r.v, r.u) for r in single.collect())
    assert got == want
