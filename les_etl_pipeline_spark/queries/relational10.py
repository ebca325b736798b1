"""Eighth relational pack: TPC-H Q2 (min-cost supplier) — the last
flagship TPC-H shape (correlated scalar-min over a multi-way join).

Plan notes (100 TB posture): the supply relation is derived from
lineitem with ONE exchange on (partkey, suppkey); the per-part minimum
is a window partitioned by partkey (second exchange, same data), never
a correlated re-scan. nation/region are broadcast by hint
(fixed-cardinality dims); supplier and the supply table are left to AQE
— at scale both are data-sized and a forced broadcast would OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..functions.rounding import hround
from .registry import register


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT l_partkey, l_suppkey, ps_supplycost, s_name, s_acctbal, n_name
      FROM supply
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), best AS (
      SELECT *, min(ps_supplycost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM eu
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           (floor(ps_supplycost * 1000000.0 + 0.5) / 1000000.0) AS supply_cost_r
    FROM best JOIN part ON l_partkey = p_partkey
    WHERE ps_supplycost = min_cost
      AND p_size <= 15 AND p_type = 'SMALL'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (min-cost supplier; reference DAG families run
    the same correlated-min shape — no partsupp table in the test
    schema, so the supply relation is min unit price per (part,
    supplier) from lineitem): for every small part, the European
    supplier(s) charging the part's minimum supply cost, best-funded
    suppliers first.

    The classic correlated scalar-min subquery, decorrelated Spark-first:
    the per-part minimum is a window over the already-joined EU supply
    rows (one exchange on partkey) and the filter keeps the rows that
    meet it — the same rows the correlated NOT-EXISTS formulation keeps,
    without re-scanning supply per part. Ordering is total (s_name and
    p_partkey are unique per row), so LIMIT 100 is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))

    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    # fixed-cardinality dims -> broadcast; supplier/supply left to AQE
    eu_sup = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu = supply.join(eu_sup, supply.ps_suppkey == eu_sup.s_suppkey)
    best = eu.withColumn(
        "min_cost", F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    ).where(F.col("ps_supplycost") == F.col("min_cost"))

    part = table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    return (
        best.join(part, best.ps_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            hround(F.col("ps_supplycost"), 6).alias("supply_cost_r"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "agg_stat_moments",
    oracle="""
    WITH mu AS (
      SELECT l_returnflag, avg(CAST(l_quantity AS DOUBLE)) AS m
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           (floor((avg(pow(l_quantity - m, 3)) / pow(avg(pow(l_quantity - m, 2)), 1.5))
                  * 1000000.0 + 0.5) / 1000000.0) AS qty_skew,
           (floor((avg(pow(l_quantity - m, 4)) / pow(avg(pow(l_quantity - m, 2)), 2) - 3)
                  * 1000000.0 + 0.5) / 1000000.0) AS qty_kurt,
           mode(l_linestatus) AS status_mode,
           CAST(arg_max(l_quantity, c * 100 - l_quantity) AS BIGINT) AS qty_mode,
           CAST(count_if(l_quantity > 40) AS BIGINT) AS n_heavy
    FROM (
      SELECT l_returnflag, l_linestatus, l_quantity,
             count(*) OVER (PARTITION BY l_returnflag, l_quantity) AS c
      FROM lineitem
    ) l JOIN mu USING (l_returnflag)
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def agg_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments and categorical modes per group:
    population skewness/excess kurtosis (Spark's definitions — the
    oracle spells out the central-moment formula so both engines compute
    the same estimator; DuckDB's bare skewness() is sample-corrected and
    would NOT match), mode of a column whose winner is unambiguous,
    a deterministic numeric mode (max count, ties to the smaller value
    — bare mode() on tied counts is engine-arbitrary, the same trap
    agg_bool_and_minmax_by pins for max_by), and count_if. One map-side
    combinable exchange."""
    li = table(spark, sf_dir, "lineitem")
    qty_counts = li.withColumn(
        "c", F.count(F.lit(1)).over(W.partitionBy("l_returnflag", "l_quantity"))
    )
    return (
        qty_counts.groupBy("l_returnflag")
        .agg(
            hround(F.skewness("l_quantity"), 6).alias("qty_skew"),
            hround(F.kurtosis("l_quantity"), 6).alias("qty_kurt"),
            F.mode("l_linestatus").alias("status_mode"),
            F.max_by("l_quantity", F.col("c") * 100 - F.col("l_quantity"))
            .cast("long")
            .alias("qty_mode"),
            F.count_if(F.col("l_quantity") > 40).alias("n_heavy"),
        )
        .orderBy("l_returnflag")
    )


@register("agg_hll_sketch_union")  # Datasketches HLL — engine-specific, rows-only
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache Datasketches HLL, Spark
    4 hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-flag
    part sketches plus a TOTAL row whose estimate comes from UNIONING
    the group sketches, not rescanning — the pre-aggregation pattern
    that makes distinct counts composable across partitions/days at
    100 TB (approx_count_distinct gives one number; sketches give a
    reusable intermediate). Binary sketches are engine-specific →
    rows-only check; merge-consistency bound pinned in
    tests/test_approx_bounds.py."""
    li = table(spark, sf_dir, "lineitem")
    sketches = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    per_group = sketches.select(
        "l_returnflag", F.hll_sketch_estimate("sk").alias("distinct_parts_est")
    )
    total = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_parts_est")
    ).select(F.lit("TOTAL").alias("l_returnflag"), "distinct_parts_est")
    return per_group.unionAll(total).orderBy("l_returnflag")


@register(
    "agg_approx_topk",
    oracle="""
    SELECT o_orderpriority AS item, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    ORDER BY n DESC, item
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters via the approx_top_k sketch (Spark 4.1): a single
    bounded-memory map-side sketch replaces the full groupBy when only
    the top items matter — at 100 TB the shuffle carries one sketch per
    partition instead of every distinct key. Oracle-PAIRED (not
    rows-only): with maxItemsTracked (100k) >= distinct values (5
    priorities), the sketch tracks every key exactly, so its counts
    equal the exact GROUP BY — the query pins this exactness regime, and
    sorting by (count, item) removes tie order as a variable."""
    o = table(spark, sf_dir, "orders")
    return (
        spark.sql(
            "SELECT inline(approx_top_k(o_orderpriority, 10, 100000)) FROM {t}", t=o
        )
        .select("item", F.col("count").alias("n"))
        .orderBy(F.desc("n"), "item")
    )


@register(
    "agg_equidepth_histogram",
    oracle="""
    WITH b AS (
      SELECT l_extendedprice AS p,
             ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(p) AS lo, max(p) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (8 quantile buckets over extended price) —
    the CBO/statistics primitive complementing the equi-width
    agg_price_histogram. The total order is made deterministic with the
    (price, orderkey, linenumber) tie-break. Computed with
    scale.exact_ntile — bit-identical ntile(8) semantics from the
    range-partitioned parallel global rank, NO single-task global sort
    (the r5 verdict's scale-weak plan); an approximate variant via
    approx_percentile edges lives in agg_approx_percentiles."""
    from ..operators.scale import exact_ntile

    li = table(spark, sf_dir, "lineitem")
    binned = exact_ntile(
        li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        8,
    )
    return (
        binned.select(F.col("l_extendedprice").alias("p"), "bucket")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.min("p").alias("lo"), F.max("p").alias("hi"))
        .select(F.col("bucket").cast("long").alias("bucket"), "n", "lo", "hi")
        .orderBy("bucket")
    )
