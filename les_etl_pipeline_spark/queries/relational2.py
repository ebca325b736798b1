"""Relational coverage batch 2 (SURVEY.md §2.12 continued): statistical
aggregates, exact percentiles, pivot, analytic window functions,
correlated subqueries (EXISTS / IN / scalar), as-of join via the
union+window algorithm, HAVING, regexp / math / null-handling scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table, register_views
from ..functions.rounding import hround
from .registry import register


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT (floor((sum(l_extendedprice * l_discount)) * 100.0 + 0.5) / 100.0) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            hround(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_statistical",
    oracle="""
    SELECT l_returnflag,
           (floor((stddev_samp(l_extendedprice)) * 10000.0 + 0.5) / 10000.0) AS sd_price,
           (floor((var_samp(l_discount)) * 1000000.0 + 0.5) / 1000000.0)     AS var_disc,
           (floor((corr(l_quantity, l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0) AS corr_qty_price,
           (floor((covar_samp(l_quantity, l_discount)) * 1000000.0 + 0.5) / 1000000.0) AS covar_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        hround(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        hround(F.var_samp("l_discount"), 6).alias("var_disc"),
        hround(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        hround(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
    )


@register(
    "agg_exact_percentiles",
    oracle="""
    SELECT o_orderstatus,
           (floor((quantile_cont(o_totalprice, 0.5)) * 100.0 + 0.5) / 100.0)  AS median_price,
           (floor((quantile_cont(o_totalprice, 0.95)) * 100.0 + 0.5) / 100.0) AS p95_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile`; the approximate
    scale path is percentile_approx/approx_count_distinct)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        hround(F.expr("percentile(o_totalprice, 0.5)")).alias("median_price"),
        hround(F.expr("percentile(o_totalprice, 0.95)")).alias("p95_price"),
    )


@register(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           (floor((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 100.0 + 0.5) / 100.0) AS F,
           (floor((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 100.0 + 0.5) / 100.0) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    piv = li.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"]).agg(
        F.sum("l_quantity")
    )
    return piv.select(
        "l_returnflag", hround(F.col("F")).alias("F"), hround(F.col("O")).alias("O")
    )


@register(
    "window_analytic_values",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           first_value(s_name) OVER w AS richest,
           last_value(s_name)  OVER w AS poorest,
           nth_value(s_name, 2) OVER w AS runner_up,
           (floor((percent_rank() OVER w) * 10000.0 + 0.5) / 10000.0) AS pct_rank,
           (floor((cume_dist() OVER w) * 10000.0 + 0.5) / 10000.0) AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_analytic_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("s_nationkey")
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    # percent_rank/cume_dist need an ordered frame without ROWS override
    wo = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.first("s_name").over(w).alias("richest"),
        F.last("s_name").over(w).alias("poorest"),
        F.nth_value("s_name", 2).over(w).alias("runner_up"),
        hround(F.percent_rank().over(wo), 4).alias("pct_rank"),
        hround(F.cume_dist().over(wo), 4).alias("cume"),
    )


@register(
    "subquery_exists_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def subquery_exists_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "subquery_scalar_q17",
    oracle="""
    SELECT (floor((sum(l_extendedprice) / 7.0) * 100.0 + 0.5) / 100.0) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem l
    WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                        WHERE l_partkey = l.l_partkey)
    """,
)
def subquery_scalar_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT floor(sum(l_extendedprice) / 7.0D * 100.0D + 0.5D) / 100.0D AS avg_yearly,
               count(*) AS n_small
        FROM lineitem l
        WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                            WHERE l_partkey = l.l_partkey)
        """
    )


@register(
    "subquery_in_uncorrelated",
    oracle="""
    SELECT count(*) AS n_items
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
    """,
)
def subquery_in_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT count(*) AS n_items
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
        """
    )


@register(
    "having_filter",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 15)
    )


@register(
    "asof_join_union_window",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'view' THEN ts END AS view_ts
      FROM events WHERE event_type IN ('view', 'purchase')
    ), filled AS (
      SELECT user_id, ts, event_id, value,
             max(view_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS last_view_ts
      FROM tagged
    )
    SELECT f.event_id AS purchase_id,
           strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(f.last_view_ts, '%Y-%m-%d %H:%M:%S') AS prior_view_ts
    FROM filled f JOIN events e ON f.event_id = e.event_id
    WHERE e.event_type = 'purchase'
    """,
)
def asof_join_union_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each purchase matched to the latest prior view of the
    same user) via the union+running-max algorithm — one shuffle on
    user_id, no pairwise join; the scalable as-of plan (SURVEY.md §2.12
    'as-of via union+window')."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.withColumn(
        "view_ts", F.when(F.col("event_type") == "view", F.col("ts"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = tagged.withColumn("last_view_ts", F.max("view_ts").over(w))
    return filled.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("last_view_ts", "yyyy-MM-dd HH:mm:ss").alias("prior_view_ts"),
    )


@register(
    "scalar_regexp_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                    AS first_word,
           regexp_replace(text, '[aeiou]', '_', 'g')              AS devoweled_prefix,
           regexp_matches(text, 'spark.*table')                   AS has_spark_table,
           CAST(len(regexp_split_to_array(text, '\\s+')) AS INT)  AS n_ws_tokens
    FROM (SELECT doc_id, substr(text, 1, 40) AS text FROM documents)
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("text")
    )
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", r"[aeiou]", "_").alias("devoweled_prefix"),
        F.col("text").rlike("spark.*table").alias("has_spark_table"),
        F.size(F.split(F.col("text"), r"\s+")).alias("n_ws_tokens"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (floor((sqrt(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0) AS sqrt_price,
           (floor((ln(l_extendedprice + 1)) * 1000000.0 + 0.5) / 1000000.0) AS ln_price,
           (floor((exp(l_discount)) * 1000000.0 + 0.5) / 1000000.0) AS exp_disc,
           (floor((pow(l_quantity, 2)) * 100.0 + 0.5) / 100.0) AS qty_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           l_orderkey % 7 AS key_mod
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        hround(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        hround(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        hround(F.exp("l_discount"), 6).alias("exp_disc"),
        hround(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "scalar_null_handling",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'open')       AS status_or_open,
           greatest(o_totalprice, 100000.0)                   AS floor_100k,
           least(o_totalprice, 400000.0)                      AS cap_400k,
           (o_orderstatus IS NULL)                            AS status_null,
           ifnull(NULL, o_orderpriority)                      AS prio
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floor_100k"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("cap_400k"),
        F.col("o_orderstatus").isNull().alias("status_null"),
        F.ifnull(F.lit(None).cast("string"), F.col("o_orderpriority")).alias("prio"),
    )


@register(
    "union_by_name_mismatched",
    oracle="""
    SELECT id, kind, acctbal FROM (
      SELECT c_custkey AS id, 'customer' AS kind,
             (floor((c_acctbal) * 100.0 + 0.5) / 100.0) AS acctbal
      FROM customer WHERE c_acctbal > 9990
      UNION ALL
      SELECT s_suppkey AS id, 'supplier' AS kind,
             (floor((s_acctbal) * 100.0 + 0.5) / 100.0) AS acctbal
      FROM supplier WHERE s_acctbal > 9000
    )
    """,
)
def union_by_name_mismatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9990)
        .select(
            F.col("c_custkey").alias("id"),
            hround("c_acctbal").alias("acctbal"),
            F.lit("customer").alias("kind"),
        )
    )
    s = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(
            F.lit("supplier").alias("kind"),
            F.col("s_suppkey").alias("id"),
            hround("s_acctbal").alias("acctbal"),
        )
    )
    return c.unionByName(s)  # column order differs between branches


@register(
    "posexplode_tokens",
    oracle="""
    SELECT doc_id, CAST(pos - 1 AS INT) AS pos, w
    FROM (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
          FROM documents WHERE doc_id < 20)
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )


@register(
    "sequence_generation",
    oracle="""
    SELECT n.n_nationkey,
           CAST(m AS INT) AS month_no
    FROM nation n, generate_series(1, 3) g(m)
    WHERE n.n_nationkey < 5
    """,
)
def sequence_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").where(F.col("n_nationkey") < 5)
    return n.select(
        "n_nationkey",
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("month_no"),
    )
