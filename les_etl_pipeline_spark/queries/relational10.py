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
