"""Fifth relational pack: remaining TPC-H shapes the test schema can
express (Q8 market share, Q16 supplier counts adapted — no partsupp
table exists), null-safe equality join, distribution window functions
(percent_rank / cume_dist), width_bucket histograms, and a cohort
retention matrix over events.

Plan notes (100 TB posture):
- q8: fixed-cardinality dims (nation 25, region 5, and here part's
  filtered slice) get explicit broadcast hints; fact-scale sides stay
  unhinted so AQE picks shuffle joins at real scale.
- null-safe join: eqNullSafe compiles to a regular equi-join key
  (SortMergeJoin/BHJ on coalesced null bucket), NOT a nested loop —
  the null rows hash to one key each side.
- percent_rank/cume_dist: one exchange per partition key, same as rank.
- width_bucket histogram: projection + tiny-domain groupBy (13 buckets).
- retention: two aggregations over one user_id exchange (first-event
  cohort, then offset counts); the self-join is user-keyed, never
  event x event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from .registry import register


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'EUROPE'
        AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    )
    SELECT o_year,
           (floor((sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                   / sum(volume)) * 1000000.0 + 0.5) / 1000000.0) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_7's share of STANDARD-part
    revenue delivered into EUROPE, per order year. Seven-table star:
    conditional share = sum(CASE)/sum over the same aggregation — one
    exchange on o_year after the join tree."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .join(part, li.l_partkey == part.p_partkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0)) / F.sum("volume")
    return (
        vol.groupBy("o_year")
        .agg(hround(share, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#11'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 2, 3, 4, 5)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp table in the test schema — the
    supplier-part relation comes from lineitem): distinct suppliers per
    qualifying (brand, type, size). Distinct-agg over a filtered join;
    the NOT-LIKE / <> / IN predicates all push into the part scan."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#11")
        & ~F.col("p_type").startswith("MEDIUM")
        & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
      SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS prio
      FROM orders
    ), d AS (
      SELECT DISTINCT nullif(o_orderpriority, '3-MEDIUM') AS prio,
             coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'UNSPECIFIED') AS label
      FROM orders
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_orders
    FROM l JOIN d ON l.prio IS NOT DISTINCT FROM d.prio
    GROUP BY label ORDER BY label
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — the join family member the
    plain equi-join can't express. Still a hash-joinable key (nulls
    bucket together), never a nested loop."""
    orders = table(spark, sf_dir, "orders")
    left = orders.select(
        "o_orderkey", F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("prio")
    )
    dim = (
        orders.select(F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("dprio"))
        .distinct()
        .withColumn("label", F.coalesce("dprio", F.lit("UNSPECIFIED")))
    )
    return (
        left.join(F.broadcast(dim), left.prio.eqNullSafe(dim.dprio))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("label")
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           (floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS pct_rank,
           (floor((cume_dist() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS cume
    FROM customer
    WHERE c_custkey <= 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_mktsegment, pct_rank, c_custkey
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank, cume_dist) — the
    analytic family members the rank/dense_rank queries don't cover.
    One exchange on the partition key, computed in the same window pass."""
    cust = table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            hround(F.percent_rank().over(w), 6).alias("pct_rank"),
            hround(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_mktsegment", "pct_rank", "c_custkey")
    )


@register(
    "agg_price_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 650000 THEN 14
                ELSE CAST(floor(o_totalprice / 50000) AS INT) + 1 END AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           (floor((min(o_totalprice)) * 100.0 + 0.5) / 100.0) AS lo,
           (floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0) AS hi
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket: projection plus a
    13-bucket groupBy — the aggregation domain is the bucket count, not
    the data size, so the exchange is metadata-thin at any scale."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(650000.0), F.lit(13))
            .cast("int")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            hround(F.min("o_totalprice")).alias("lo"),
            hround(F.max("o_totalprice")).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "events_user_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_date,
             datediff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_date,
           CAST(count(DISTINCT CASE WHEN day_offset = 0 THEN user_id END) AS BIGINT) AS cohort_size,
           CAST(count(DISTINCT CASE WHEN day_offset = 1 THEN user_id END) AS BIGINT) AS day1,
           CAST(count(DISTINCT CASE WHEN day_offset = 7 THEN user_id END) AS BIGINT) AS day7
    FROM activity GROUP BY cohort_date ORDER BY cohort_date
    """,
)
def events_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen date, with
    day-1 and day-7 return counts. First-event agg and the offset join
    both key on user_id — one exchange reused, then a cohort-date-domain
    groupBy (30 rows at any scale)."""
    ev = table(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", "cohort_date", F.datediff("d", "cohort_date").alias("day_offset"))
        .distinct()
    )
    def returners(offset: int, name: str):
        return F.countDistinct(
            F.when(F.col("day_offset") == offset, F.col("user_id"))
        ).alias(name)
    return (
        activity.groupBy("cohort_date")
        .agg(returners(0, "cohort_size"), returners(1, "day1"), returners(7, "day7"))
        .orderBy("cohort_date")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS INT) AS o_year,
           (floor(sum(l_extendedprice * (1 - l_discount)
                      - p_retailprice * 0.9 * l_quantity) * 100.0 + 0.5) / 100.0)
             AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY supp_nation, o_year
    ORDER BY supp_nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp: supply cost stands in as 90% of
    p_retailprice): profit on red parts by supplier nation and order
    year. Five-table star; the LIKE filter pushes into the part scan and
    prunes the join tree at the source."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.9 * F.col("l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("n_name").alias("supp_nation"), F.year("o_orderdate").alias("o_year"))
        .agg(hround(F.sum(profit)).alias("profit"))
        .orderBy("supp_nation", F.col("o_year").desc())
    )


@register(
    "q11_value_concentration",
    oracle="""
    WITH pv AS (
      SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, (floor(value * 100.0 + 0.5) / 100.0) AS value_r
    FROM pv
    WHERE value > (SELECT sum(value) * 0.001 FROM pv)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (lineitem value stands in for partsupp stock):
    parts whose value through NATION_3 suppliers exceeds a fraction of
    that nation's total — the aggregate-vs-scalar-of-itself shape. The
    threshold comes from a 1-row aggregate broadcast against the
    per-part rows, so the part table streams once."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    pv = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    thr = pv.agg((F.sum("value") * 0.001).alias("thr"))
    return (
        pv.join(F.broadcast(thr))
        .where(F.col("value") > F.col("thr"))
        .select("l_partkey", hround(F.col("value")).alias("value_r"))
        .orderBy(F.col("value_r").desc(), "l_partkey")
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS sq
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ), pt AS (
      SELECT l_partkey, sum(l_quantity) * 0.15 AS thr
      FROM lineitem GROUP BY l_partkey
    ), cand AS (
      SELECT DISTINCT sp.l_suppkey
      FROM sp JOIN pt ON sp.l_partkey = pt.l_partkey
      WHERE sp.sq > pt.thr
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM cand)
    ORDER BY s_suppkey
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (availqty -> shipped quantity): suppliers who
    shipped more than 15% of some part's total volume — the
    correlated-aggregate semi-join shape (inner agg per supplier-part,
    threshold agg per part, candidates semi-join the dimension). Both
    aggregations reuse the partkey exchange; the final semi-join
    broadcasts the candidate id set."""
    li = table(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("sq"))
    pt = li.groupBy("l_partkey").agg((F.sum("l_quantity") * 0.15).alias("thr"))
    cand = (
        sp.join(pt, "l_partkey")
        .where(F.col("sq") > F.col("thr"))
        .select("l_suppkey")
        .distinct()
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(cand), supp.s_suppkey == cand.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
