"""Window functions (SURVEY.md §2.12): ranking, analytic, frames, top-k per
group. All deterministic — every ORDER BY carries a unique tiebreaker so
the Spark and DuckDB results are identical sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from .registry import register


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, (floor((c_acctbal) * 100.0 + 0.5) / 100.0) AS acctbal, rn
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               CAST(row_number() OVER (PARTITION BY c_nationkey
                                       ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        table(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", hround("c_acctbal").alias("acctbal"), "rn")
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           CAST(rank()       OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4)     OVER w AS INT) AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (floor((o_totalprice) * 100.0 + 0.5) / 100.0) AS totalprice,
           (floor((lag(o_totalprice) OVER w) * 100.0 + 0.5) / 100.0) AS prev_price,
           (floor((lead(o_totalprice) OVER w) * 100.0 + 0.5) / 100.0) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        hround("o_totalprice").alias("totalprice"),
        hround(F.lag("o_totalprice").over(w)).alias("prev_price"),
        hround(F.lead("o_totalprice").over(w)).alias("next_price"),
    )


@register(
    "window_running_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0) AS running_spend,
           (floor((avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0) AS moving_avg_3
    FROM orders
    """,
)
def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        hround(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))).alias("running_spend"),
        hround(F.avg("o_totalprice").over(w.rowsBetween(-2, W.currentRow))).alias(
            "moving_avg_3"
        ),
    )


@register(
    "window_share_of_group",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (floor((l_extendedprice / sum(l_extendedprice) OVER (PARTITION BY l_orderkey)) * 10000.0 + 0.5) / 10000.0) AS price_share
    FROM lineitem
    """,
)
def window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("l_orderkey")
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        hround(F.col("l_extendedprice") / F.sum("l_extendedprice").over(w), 4).alias(
            "price_share"
        ),
    )
