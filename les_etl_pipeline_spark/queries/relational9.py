"""Seventh relational pack: linear-regression aggregates, ANSI-safe
try_* arithmetic, and a third string-function pack.

Plan notes (100 TB posture): all three are single-pass — the regression
aggregates are partially combinable moments (one exchange on the group
key), the try_* and string packs are pure projections inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from .registry import register


@register(
    "agg_linear_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           (floor(regr_slope(l_extendedprice, l_quantity) * 1000000.0 + 0.5)
            / 1000000.0) AS slope,
           (floor(regr_intercept(l_extendedprice, l_quantity) * 10000.0 + 0.5)
            / 10000.0) AS intercept,
           (floor(regr_r2(l_extendedprice, l_quantity) * 1000000.0 + 0.5)
            / 1000000.0) AS r2
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares aggregates (regr_slope / intercept / r2 /
    count): price modeled on quantity per return flag. The moments are
    partially combinable, so the whole regression is one map-side-combined
    exchange on the group key — no iteration, no driver math."""
    li = table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).alias("n"),
            hround(F.regr_slope(y, x), 6).alias("slope"),
            hround(F.regr_intercept(y, x), 4).alias("intercept"),
            hround(F.regr_r2(y, x), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity - 25 = 0 THEN NULL
                ELSE l_extendedprice / (l_quantity - 25) END AS price_per_excess,
           string_split(l_returnflag || ',' || l_linestatus, ',')[5] AS missing_elem,
           TRY_CAST(l_returnflag AS DOUBLE) AS flag_as_num
    FROM lineitem WHERE l_orderkey <= 400
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* surface: try_divide NULLs division by zero (a
    plain `/` throws under Spark 4's ANSI default), try_element_at NULLs
    out-of-bounds access, try_cast NULLs unparseable input — the
    fail-soft arithmetic a dirty-data pipeline needs with ANSI on."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias(
            "price_per_excess"
        ),
        F.try_element_at(
            F.split(F.concat_ws(",", "l_returnflag", "l_linestatus"), ","), F.lit(5)
        ).alias("missing_elem"),
        F.col("l_returnflag").try_cast("double").alias("flag_as_num"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "scalar_string_funcs3",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 2) AS second_word,
           translate(p_brand, '#', '-') AS brand_dashed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           rpad(p_type, 12, '.') AS type_padded,
           repeat(left(p_name, 2), 3) AS head_thrice,
           reverse(right(p_name, 5)) AS tail_reversed
    FROM part WHERE p_partkey <= 500 ORDER BY p_partkey
    """,
)
def scalar_string_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third string pack: split_part, translate, lpad/rpad, repeat,
    left/right, reverse — the remaining everyday string surface, all
    codegen projections."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_type", 12, ".").alias("type_padded"),
        F.repeat(F.substring("p_name", 1, 2), 3).alias("head_thrice"),
        F.reverse(F.substring(F.col("p_name"), -5, 5)).alias("tail_reversed"),
    ).orderBy("p_partkey")
