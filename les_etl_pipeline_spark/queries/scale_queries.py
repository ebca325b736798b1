"""Scale-operator queries: salted aggregation and salted join produce
results identical to their plain forms — the DuckDB oracle IS the plain
form, so the correctness gate proves the rewrite is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators import scale
from .registry import register


@register(
    "scale_salted_agg",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           (floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0) AS sum_qty,
           (floor((max(l_extendedprice)) * 100.0 + 0.5) / 100.0) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def scale_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_returnflag has only 3 values — exactly the shape where one hot
    grouping key melts a single reducer at 100 TB. The salted two-phase
    plan spreads each key over 16 partials; the oracle is the PLAIN
    group-by, proving equivalence."""
    li = table(spark, sf_dir, "lineitem")
    out = scale.salted_agg(
        li,
        ["l_returnflag"],
        {
            "n_rows": ("count", "l_quantity"),
            "sum_qty_raw": ("sum", "l_quantity"),
            "max_price_raw": ("max", "l_extendedprice"),
        },
        buckets=16,
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        hround(F.col("sum_qty_raw")).alias("sum_qty"),
        hround(F.col("max_price_raw")).alias("max_price"),
    )


@register(
    "scale_salted_join",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           (floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0) AS total
    FROM orders JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders) d
      ON o_orderstatus = d.st
    GROUP BY o_orderstatus
    """,
)
def scale_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on a 3-value key (maximal skew): the salted join spreads each
    hot key across 8 salt buckets. Oracle = the plain join."""
    orders = table(spark, sf_dir, "orders")
    dim = orders.select(F.col("o_orderstatus").alias("st")).distinct().withColumn(
        "st2", F.col("st")
    )
    joined = scale.salted_join(
        orders.withColumn("st", F.col("o_orderstatus")), dim, on="st", buckets=8
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        hround(F.sum("o_totalprice")).alias("total"),
    )


@register(
    "range_join_binned",
    oracle="""
    SELECT o_orderkey, count(*) AS n_shipped
    FROM orders o JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    WHERE o_orderpriority = '1-URGENT' AND o_custkey < 50
    GROUP BY o_orderkey
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via bin bucketing
    (operators/rangejoin.py): lineitems shipped inside each urgent
    order's 30-day window, counted per order. The oracle runs the naive
    theta join — same rows, but the engine's plan is an equi hash join
    on the bin key instead of a BroadcastNestedLoop (SURVEY.md §2.12
    range-join gap)."""
    from ..operators.rangejoin import point_in_interval_join

    orders = table(spark, sf_dir, "orders")
    iv = orders.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_custkey") < 50)
    ).select(
        "o_orderkey",
        F.col("o_orderdate").alias("lo"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("hi"),
    )
    pts = table(spark, sf_dir, "lineitem").select("l_shipdate")
    j = point_in_interval_join(pts, iv, "l_shipdate", "lo", "hi", bin_width=30 * 86400)
    return j.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_shipped"))


@register(
    "scale_global_row_ids",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS row_id
    FROM documents ORDER BY doc_id
    """,
)
def scale_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global consecutive ids in key order without a global sort
    (operators/scale.global_row_ids): range partitions rank in parallel
    and a carried per-partition offset (a window over one row per
    partition) lifts local ranks to global ones — the DataFrame
    zipWithIndex. The oracle is the naive global-order row_number the
    operator exists to avoid; identical output, sharded plan (asserted
    window-shape test in tests/test_scale.py)."""
    from ..operators.scale import global_row_ids

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return global_row_ids(docs, "doc_id").orderBy("doc_id")
