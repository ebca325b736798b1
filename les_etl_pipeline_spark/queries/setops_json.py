"""Set operations, scalar function families (string / date / math /
conditional / hash), array functions, and JSON extraction (SURVEY.md §2.4,
§2.12 — the reference's F1-F15 scalar semantics generalized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from .registry import register


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@register(
    "set_union_distinct",
    oracle="""
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
      UNION
      SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000
    )
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").cast("int").alias("nk"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").cast("int").alias("nk"))
    )
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    y96 = orders.where(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = orders.where(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.intersect(y97)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    y96 = orders.where(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = orders.where(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.subtract(y97)


# --------------------------------------------------------------------------
# Scalar functions — string (reference F11: lower/trim normalize; F2 concat)
# --------------------------------------------------------------------------
@register(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS name_upper,
           lower(trim(c_mktsegment))              AS seg_norm,
           CAST(length(c_name) AS INT)            AS name_len,
           substr(c_name, 1, 8)                   AS name_prefix,
           concat_ws('|', c_mktsegment, c_name)   AS seg_name,
           replace(c_name, '#', '-')              AS name_dashed,
           CAST(strpos(c_name, '#') AS INT)       AS hash_pos
    FROM customer WHERE c_custkey <= 500
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower(F.trim(F.col("c_mktsegment"))).alias("seg_norm"),
            F.length("c_name").alias("name_len"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
            F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
            F.instr(F.col("c_name"), "#").alias("hash_pos"),
        )
    )


@register(
    "scalar_null_marker_normalize",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN trim(o_orderpriority) = '' OR o_orderpriority LIKE 'ND%'
                     OR o_orderpriority = 'No Collateral'
                THEN NULL ELSE lower(trim(o_orderpriority)) END AS priority_norm
    FROM orders WHERE o_orderkey <= 3000
    """,
)
def scalar_null_marker_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference S4/F11 ingest normalization (bronze_funcs.py:97-104) as a
    native column expression: null markers -> NULL, else lower(trim)."""
    c = F.col("o_orderpriority")
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 3000)
        .select(
            "o_orderkey",
            F.when(
                (F.trim(c) == "") | c.startswith("ND") | (c == "No Collateral"),
                F.lit(None),
            )
            .otherwise(F.lower(F.trim(c)))
            .alias("priority_norm"),
        )
    )


# --------------------------------------------------------------------------
# Scalar functions — date (reference F8 to_date, F14 multi-format coercion)
# --------------------------------------------------------------------------
@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                      AS odate,
           CAST(year(o_orderdate) AS INT)                 AS oyear,
           CAST(month(o_orderdate) AS INT)                AS omonth,
           CAST(quarter(o_orderdate) AS INT)              AS oquarter,
           CAST(dayofmonth(o_orderdate) AS INT)           AS oday,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS omonth_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)    AS due_date
    FROM orders WHERE o_orderkey <= 3000
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 3000)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            F.year("o_orderdate").alias("oyear"),
            F.month("o_orderdate").alias("omonth"),
            F.quarter("o_orderdate").alias("oquarter"),
            F.dayofmonth("o_orderdate").alias("oday"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("omonth_start"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        )
    )


@register(
    "scalar_multiformat_date",
    oracle="""
    SELECT d AS raw,
           coalesce(try_strptime(d, '%Y-%m-%d'),
                    try_strptime(d, '%Y-%m'),
                    try_strptime(d, '%Y'))::DATE AS coerced
    FROM (VALUES ('2023-06-30'), ('1999-03'), ('2019'), ('garbage'), ('')) t(d)
    """,
)
def scalar_multiformat_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F14 (validation_rules.py:10-23): dates arrive as
    yyyy-MM-dd / yyyy-MM / yyyy; coerce with format fallback, else NULL."""
    df = spark.createDataFrame(
        [("2023-06-30",), ("1999-03",), ("2019",), ("garbage",), ("",)], ["raw"]
    )
    d = F.col("raw")
    return df.select(
        "raw",
        F.coalesce(
            F.try_to_timestamp(d, F.lit("yyyy-MM-dd")),
            F.try_to_timestamp(d, F.lit("yyyy-MM")),
            F.try_to_timestamp(d, F.lit("yyyy")),
        )
        .cast("date")
        .alias("coerced"),
    )


# --------------------------------------------------------------------------
# Scalar functions — math / conditional / hash (reference F1, F7, F9, F10)
# --------------------------------------------------------------------------
@register(
    "scalar_math_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0) AS net_price,
           CAST(ceil(l_quantity)  AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           abs(l_discount - 0.05)            AS disc_dev,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END             AS qty_band
    FROM lineitem WHERE l_orderkey <= 2000
    """,
)
def scalar_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            hround(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "net_price"
            ),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.floor("l_quantity").alias("qty_floor"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.when(F.col("l_quantity") >= 40, "bulk")
            .when(F.col("l_quantity") >= 10, "mid")
            .otherwise("small")
            .alias("qty_band"),
        )
    )


@register(
    "scalar_md5_checksum",
    oracle="""
    SELECT o_orderkey,
           md5(concat_ws('\x1f', CAST(o_orderkey AS VARCHAR), o_orderstatus,
                         o_orderpriority)) AS checksum
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_md5_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F1 row checksum (bronze_funcs.py:117-119) in the null-safe
    concat_ws form SURVEY.md §7.4(3) prescribes."""
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.col("o_orderkey").cast("string"),
                    "o_orderstatus",
                    "o_orderpriority",
                )
            ).alias("checksum"),
        )
    )


# --------------------------------------------------------------------------
# Array functions (reference §1.2: ISIN ;-join generalized) + JSON (events)
# --------------------------------------------------------------------------
@register(
    "array_ops_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT)        AS n_tokens,
           string_split(text, ' ')[1]                       AS first_token,
           list_contains(string_split(text, ' '), 'spark')  AS mentions_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ';')
                                                            AS vocab_joined
    FROM documents
    """,
)
def array_ops_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ";").alias("vocab_joined"),
    )


@register(
    "array_explode_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    HAVING count(*) > 5
    """,
)
def array_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 5)
    )


@register(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
           (floor((avg(CAST(props->>'k' AS INT))) * 100.0 + 0.5) / 100.0)       AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        table(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            hround(F.avg("k")).alias("avg_k"),
        )
    )


@register(
    "scalar_transliterate",
    oracle="""
    SELECT s AS raw, strip_accents(s) AS folded
    FROM (VALUES ('crédit bail'), ('münchen lease'), ('sécurité'),
                 ('plain ascii'), (NULL)) t(s)
    """,
)
def scalar_transliterate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 transliteration through the Arrow pandas UDF
    (operators/normalize.transliterate_ascii); the oracle is DuckDB's
    strip_accents, which matches NFKD combining-mark removal for accented
    latin (the fixture deliberately avoids ligatures/ß where the two
    diverge — see the operator docstring)."""
    from ..operators.normalize import transliterate_ascii

    df = spark.createDataFrame(
        [("crédit bail",), ("münchen lease",), ("sécurité",), ("plain ascii",), (None,)],
        "raw string",
    )
    return df.select("raw", transliterate_ascii("raw").alias("folded"))


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersectAll(o)


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.exceptAll(o)


@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT c_custkey,
           translate(c_name, '#0', '-O')              AS name_translated,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')  AS key_padded,
           rpad(c_mktsegment, 12, '.')                AS seg_padded,
           split_part(c_name, '#', 1)                 AS name_head,
           reverse(c_mktsegment)                      AS seg_rev,
           repeat('ab', 3)                            AS rep,
           left(c_name, 4)                            AS name_left,
           right(c_name, 3)                           AS name_right
    FROM customer WHERE c_custkey <= 300
    """,
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 300)
        .select(
            "c_custkey",
            F.translate("c_name", "#0", "-O").alias("name_translated"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
            F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
            F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
            F.reverse("c_mktsegment").alias("seg_rev"),
            F.repeat(F.lit("ab"), 3).alias("rep"),
            F.substring("c_name", 1, 4).alias("name_left"),
            F.expr("right(c_name, 3)").alias("name_right"),
        )
    )


@register(
    "scalar_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)  AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT)
                                                              AS days_to_y2k,
           CAST(dayofweek(o_orderdate) + 1 AS INT)            AS dow_sun1,
           CAST(weekofyear(o_orderdate) AS INT)               AS week_no
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date pack. Cross-engine traps handled: DuckDB dayofweek is
    0=Sunday vs Spark 1=Sunday (+1 in the oracle); DuckDB date_diff takes
    (unit, start, end) vs Spark datediff(end, start)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus_3mo"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.dayofweek(d).alias("dow_sun1"),
        F.weekofyear(d).alias("week_no"),
    )


@register(
    "map_transform_entries",
    oracle="""
    SELECT o_orderkey, k AS key, v AS val FROM (
      SELECT o_orderkey, 'price' AS k, o_totalprice * 2 AS v
      FROM orders WHERE o_orderkey <= 300
      UNION ALL
      SELECT o_orderkey, 'key', CAST(o_orderkey AS DOUBLE) * 2
      FROM orders WHERE o_orderkey <= 300
    ) ORDER BY o_orderkey, key
    """,
)
def map_transform_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + higher-order map transform: map_from_arrays ->
    transform_values (double every value) -> explode back to (key, value)
    rows. Exploded entries are the engine-portable face of the map (map
    column ordering is undefined across engines); everything before the
    explode is a pure projection."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    m = F.map_from_arrays(
        F.array(F.lit("price"), F.lit("key")),
        F.array(F.col("o_totalprice"), F.col("o_orderkey").cast("double")),
    )
    doubled = F.transform_values(m, lambda _, v: v * 2)
    return (
        o.select("o_orderkey", F.explode(doubled).alias("key", "val"))
        .orderBy("o_orderkey", "key")
    )
