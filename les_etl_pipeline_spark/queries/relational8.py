"""Sixth relational pack: value window functions with explicit frames,
higher-order array functions, explode_outer null-preservation, a third
date pack (trunc/quarter/make_date/interval), and grouping_id over
rollup.

Plan notes (100 TB posture):
- first/last/nth_value share one window exchange with the frame spec —
  no extra shuffle per function.
- higher-order array funcs are pure projections (whole-stage codegen),
  zero shuffle.
- explode_outer is a generator projection; row count grows only by the
  empty-array rows it preserves.
- grouping_id rides the same Expand the rollup already plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from .registry import register


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions (first_value / last_value / nth_value) over
    an explicit unbounded frame — without it last_value degenerates to
    the running row, the classic frame-default trap. All three share one
    exchange on o_custkey."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "scalar_higher_order_arrays",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           len(list_filter(toks, x -> len(x) > 5)) > 0 AS has_long,
           len(list_filter(toks, x -> len(x) >= 15)) = 0 AS all_short,
           CAST(len(list_filter(toks, x -> x LIKE '%e%')) AS INT) AS n_with_e,
           CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS BIGINT)
             AS total_chars,
           array_to_string(list_transform(toks[1:3], x -> upper(x)), '|') AS head_upper
    FROM t ORDER BY doc_id
    """,
)
def scalar_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as pure projections: exists, forall,
    filter+size, aggregate (fold), transform+slice — the lambda surface
    of the array type, all inside whole-stage codegen with no explode
    and no shuffle."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.exists(toks, lambda x: F.length(x) > 5).alias("has_long"),
        F.forall(toks, lambda x: F.length(x) < 15).alias("all_short"),
        F.size(F.filter(toks, lambda x: x.contains("e"))).alias("n_with_e"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), "|"
        ).alias("head_upper"),
    ).orderBy("doc_id")


@register(
    "explode_outer_preserves_empty",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x LIKE 'z%') AS zs
      FROM documents
    ), rows_ AS (
      SELECT doc_id, unnest(zs) AS z FROM t WHERE len(zs) > 0
      UNION ALL
      SELECT doc_id, NULL AS z FROM t WHERE len(zs) = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(z) AS BIGINT) AS n_tokens,
           CAST(count(*) - count(z) AS BIGINT) AS n_docs_without,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM rows_
    """,
)
def explode_outer_preserves_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer vs explode: documents whose filtered token array is
    empty survive as a single null row instead of vanishing — the
    left-join-shaped generator. The aggregate proves the preserved rows
    equal the docs-without-match count and no doc was dropped."""
    docs = table(spark, sf_dir, "documents")
    zs = F.filter(F.split("text", " "), lambda x: x.startswith("z"))
    exploded = docs.select("doc_id", F.explode_outer(zs).alias("z"))
    return exploded.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("z").alias("n_tokens"),
        (F.count(F.lit(1)) - F.count("z")).alias("n_docs_without"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@register(
    "scalar_date_funcs3",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1)
             AS month_start,
           CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS due_45d,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS month_index
    FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey
    """,
)
def scalar_date_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third date pack: date_trunc to quarter, quarter extraction,
    make_date construction, interval arithmetic, and a linear month
    index — the calendar-bucketing surface time-partitioned pipelines
    lean on."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("quarter", d).cast("date").alias("qtr_start"),
        F.quarter(d).alias("qtr"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_start"),
        F.date_add(d, 45).alias("due_45d"),
        (F.year(d).cast("long") * 12 + F.month(d)).alias("month_index"),
    ).orderBy("o_orderkey")


@register(
    "agg_rollup_grouping_id",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY gid, region, nation
    """,
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id over a rollup: distinguishes a NULL that came from the
    data from a NULL the rollup synthesized — the disambiguation bit
    rides the same Expand node the rollup already plans, no extra
    shuffle."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "gid",
            "n_customers",
        )
        .orderBy("gid", "region", "nation")
    )


@register(
    "window_range_value_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(count(*) OVER w AS BIGINT) AS n_within_5k,
           (floor(avg(o_totalprice) OVER w * 100.0 + 0.5) / 100.0) AS avg_within_5k
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
)
def window_range_value_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a VALUE offset (not row counts): every order is
    compared to the customer's other orders priced within 5000 below it
    — peer rows enter the frame by value distance, the frame family
    ROWS frames can't express. Same single exchange on the partition
    key."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    # fractional RANGE boundaries need the SQL spelling — the PySpark
    # rangeBetween builder only takes long offsets
    frame = (
        "OVER (PARTITION BY o_custkey ORDER BY o_totalprice "
        "RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW)"
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.expr(f"count(*) {frame}").alias("n_within_5k"),
        hround(F.expr(f"avg(o_totalprice) {frame}")).alias("avg_within_5k"),
    ).orderBy("o_custkey", "o_totalprice", "o_orderkey")


@register(
    "arrays_zip_inline",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE doc_id <= 40
    )
    SELECT doc_id,
           toks[i] AS token,
           CAST(len(toks[i]) AS INT) AS token_len,
           CAST(i - 1 AS INT) AS pos
    FROM t CROSS JOIN (SELECT unnest(generate_series(1, 4096)) AS i) g
    WHERE i <= n ORDER BY doc_id, pos
    """,
)
def arrays_zip_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip + inline: two parallel arrays (tokens, their lengths,
    positions) zip into structs and inline to columns in one generator —
    completing the explode / posexplode / explode_outer / inline family.
    The oracle indexes the arrays positionally."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 40)
    toks = F.split("text", " ")
    zipped = F.arrays_zip(
        toks.alias("token"),
        F.transform(toks, lambda x: F.length(x)).alias("token_len"),
        F.sequence(F.lit(0), F.size(toks) - 1).alias("pos"),
    )
    return (
        docs.select("doc_id", F.inline(zipped))
        .orderBy("doc_id", "pos")
    )


@register(
    "window_lag_ignore_nulls",
    oracle="""
    SELECT o_orderkey, o_custkey, flagged,
           lag(flagged IGNORE NULLS) OVER w AS prev_flagged,
           lead(flagged IGNORE NULLS) OVER w AS next_flagged
    FROM (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS flagged
      FROM orders WHERE o_custkey <= 150
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with IGNORE NULLS: the offset skips null rows entirely
    (last/next OBSERVED value), not just returns null — the sparse
    time-series carry-forward primitive plain lag can't express."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 150)
    flagged = F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice"))
    base = o.select("o_orderkey", "o_custkey", flagged.alias("flagged"))
    over = "OVER (PARTITION BY o_custkey ORDER BY o_orderkey)"
    return base.select(
        "o_orderkey",
        "o_custkey",
        "flagged",
        F.expr(f"lag(flagged) IGNORE NULLS {over}").alias("prev_flagged"),
        F.expr(f"lead(flagged) IGNORE NULLS {over}").alias("next_flagged"),
    ).orderBy("o_custkey", "o_orderkey")
