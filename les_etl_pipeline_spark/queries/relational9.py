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


@register(
    "json_roundtrip_nested",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_totalprice AS first_price,
           CAST(1 AS INT) AS n_prices,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
    """,
)
def json_roundtrip_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed nested JSON round-trip: to_json(named_struct with an array +
    nested struct) -> from_json with an explicit schema -> field access.
    The oracle states the identity directly, so a pass proves from_json
    reconstructs every typed field (string, double array, nested struct)
    byte-exactly. Pure projections, no shuffle."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    js = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.array(F.col("o_totalprice")).alias("prices"),
            F.struct(F.col("o_orderpriority").alias("prio")).alias("meta"),
        )
    )
    schema = "status string, prices array<double>, meta struct<prio:string>"
    parsed = F.from_json(js, schema)
    return o.select(
        "o_orderkey",
        parsed["status"].alias("status"),
        parsed["prices"][0].alias("first_price"),
        F.size(parsed["prices"]).alias("n_prices"),
        parsed["meta"]["prio"].alias("prio"),
    ).orderBy("o_orderkey")


@register(
    "pivot_multi_agg",
    oracle="""
    SELECT lang,
           CAST(count(*) FILTER (source = 'src0') AS BIGINT) AS src0_n,
           (floor(avg(n_chars) FILTER (source = 'src0') * 100.0 + 0.5) / 100.0) AS src0_avg_chars,
           CAST(count(*) FILTER (source = 'src1') AS BIGINT) AS src1_n,
           (floor(avg(n_chars) FILTER (source = 'src1') * 100.0 + 0.5) / 100.0) AS src1_avg_chars,
           CAST(count(*) FILTER (source = 'src2') AS BIGINT) AS src2_n,
           (floor(avg(n_chars) FILTER (source = 'src2') * 100.0 + 0.5) / 100.0) AS src2_avg_chars
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell (count + avg) and an
    explicit pivot-value list — explicit values skip the extra
    distinct-scan job Spark otherwise runs to discover them, and the
    whole reshape stays one exchange on the groupBy key."""
    docs = table(spark, sf_dir, "documents")
    out = (
        docs.groupBy("lang")
        .pivot("source", ["src0", "src1", "src2"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            hround(F.avg("n_chars")).alias("avg_chars"),
        )
        .orderBy("lang")
    )
    # Spark names pivot columns '{value}_{aggAlias}' — already the oracle's
    # shape; count cells for empty groups come back NULL, align to 0
    for v in ("src0", "src1", "src2"):
        out = out.withColumn(f"{v}_n", F.coalesce(F.col(f"{v}_n"), F.lit(0)))
    return out


@register(
    "graph_triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      WHERE a.l_orderkey <= 300 AND b.l_orderkey <= 300
    )
    SELECT CAST((SELECT count(DISTINCT s) FROM
                  (SELECT s1 AS s FROM e UNION ALL SELECT s2 FROM e)) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM e e1
                 JOIN e e2 ON e1.s2 = e2.s1
                 JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2) AS BIGINT) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics on join machinery: the supplier co-occurrence
    graph (suppliers sharing an order) and its exact triangle count via
    the canonical oriented 3-way self-join (s1<s2<s3 counts each
    triangle once). Edge building shuffles on the order key; the
    triangle join keys on vertex ids — both AQE-sized hash joins, no
    nested loop, and integer-exact output."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    a = li.select("l_orderkey", F.col("l_suppkey").alias("s1"))
    b = li.select("l_orderkey", F.col("l_suppkey").alias("s2"))
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    e = e.localCheckpoint()  # three consumers below; avoid triple re-build
    nodes = e.select(F.col("s1").alias("s")).union(e.select("s2")).distinct()
    e1 = e.select(F.col("s1").alias("x"), F.col("s2").alias("y"))
    e2 = e.select(F.col("s1").alias("y"), F.col("s2").alias("z"))
    e3 = e.select(F.col("s1").alias("x"), F.col("s2").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return (
        nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
        .join(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .join(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


@register(
    "graph_pagerank_fixed",
    oracle="""
    WITH base AS (
      SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      WHERE a.l_orderkey <= 300 AND b.l_orderkey <= 300
    ), e AS (
      SELECT s1 AS src, s2 AS dst FROM base
      UNION SELECT s2, s1 FROM base
    ), nodes AS (SELECT DISTINCT src AS node FROM e),
    n AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM n) AS rank FROM nodes),
    pr1 AS (
      SELECT nodes.node,
             0.15 / (SELECT n FROM n)
             + 0.85 * coalesce(sum(pr0.rank / deg.deg), 0) AS rank
      FROM nodes
      LEFT JOIN e ON e.dst = nodes.node
      LEFT JOIN pr0 ON pr0.node = e.src
      LEFT JOIN deg ON deg.src = e.src
      GROUP BY nodes.node
    ), pr2 AS (
      SELECT nodes.node,
             0.15 / (SELECT n FROM n)
             + 0.85 * coalesce(sum(pr1.rank / deg.deg), 0) AS rank
      FROM nodes
      LEFT JOIN e ON e.dst = nodes.node
      LEFT JOIN pr1 ON pr1.node = e.src
      LEFT JOIN deg ON deg.src = e.src
      GROUP BY nodes.node
    ), pr3 AS (
      SELECT nodes.node,
             0.15 / (SELECT n FROM n)
             + 0.85 * coalesce(sum(pr2.rank / deg.deg), 0) AS rank
      FROM nodes
      LEFT JOIN e ON e.dst = nodes.node
      LEFT JOIN pr2 ON pr2.node = e.src
      LEFT JOIN deg ON deg.src = e.src
      GROUP BY nodes.node
    )
    SELECT node, (floor(rank * 10000000.0 + 0.5) / 10000000.0) AS rank_r
    FROM pr3 ORDER BY node
    """,
)
def graph_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.pagerank, 3 iterations,
    d=0.85) over the undirected supplier co-occurrence graph — the
    second iterative-algorithm surface next to connected components.
    Deterministic by construction (no convergence test), so the oracle
    simply unrolls the same three iterations as chained CTEs."""
    from ..operators.graph import pagerank

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    a = li.select("l_orderkey", F.col("l_suppkey").alias("s1"))
    b = li.select("l_orderkey", F.col("l_suppkey").alias("s2"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    ranks = pagerank(edges, iterations=3, damping=0.85, symmetric=True)
    return ranks.select("node", hround(F.col("rank"), 7).alias("rank_r")).orderBy("node")


@register(
    "stat_crosstab",
    oracle="""
    SELECT lang AS lang_source,
           CAST(count(*) FILTER (source = 'src0') AS BIGINT) AS src0,
           CAST(count(*) FILTER (source = 'src1') AS BIGINT) AS src1,
           CAST(count(*) FILTER (source = 'src2') AS BIGINT) AS src2,
           CAST(count(*) FILTER (source = 'src3') AS BIGINT) AS src3
    FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
    GROUP BY lang ORDER BY lang
    """,
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via DataFrameStatFunctions.crosstab — the stat
    helper face of the pivot shape (pair counts of two categoricals in
    one pass). Restricted to a fixed source list so the column set is
    stable; the driver's schema compare sorts column names, so crosstab's
    engine-defined column order is harmless. crosstab only emits columns
    for values observed in the data, so any absent source is filled in
    as a zero-count column rather than failing the projection."""
    docs = table(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1", "src2", "src3")
    )
    ct = docs.stat.crosstab("lang", "source")
    for c in ("src0", "src1", "src2", "src3"):
        if c not in ct.columns:
            ct = ct.withColumn(c, F.lit(0).cast("long"))
    return ct.select(
        "lang_source",
        *[F.col(f"`{c}`").alias(c) for c in ("src0", "src1", "src2", "src3")],
    ).orderBy("lang_source")


@register(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey, 1365) AS BIGINT) AS xored,
           CAST(o_orderkey << 3 AS BIGINT) AS shifted_l,
           CAST(o_orderkey >> 2 AS BIGINT) AS shifted_r,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: and/or/xor, shifts, popcount — the bit-packing
    toolkit (flag words, bloom/bitmap membership) as pure codegen
    projections."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(k, 3).alias("shifted_l"),
        F.shiftright(k, 2).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    ).orderBy("o_orderkey")


@register(
    "agg_bool_and_minmax_by",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 1) AS all_multi,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(max_by(l_orderkey,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000000 + l_orderkey)
                AS BIGINT) AS priciest_order,
           CAST(min_by(l_orderkey,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000000 + l_orderkey)
                AS BIGINT) AS cheapest_order
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_bool_and_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or = SQL EVERY / ANY) and
    argmin/argmax via min_by/max_by. The ranking value folds the
    orderkey into integer cents so ties are broken deterministically —
    max_by on a float with duplicates is engine-arbitrary, a correctness
    trap this query pins down. The cents conversion is floor(x*100+0.5)
    on BOTH engines: a bare double→long CAST truncates in Spark but
    rounds in DuckDB, so prices landing just below an integer in binary
    floating point would rank differently across engines."""
    li = table(spark, sf_dir, "lineitem")
    rank_val = (
        F.floor(F.col("l_extendedprice") * 100 + 0.5) * 10000000 + F.col("l_orderkey")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 1).alias("all_multi"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
            F.max_by("l_orderkey", rank_val).alias("priciest_order"),
            F.min_by("l_orderkey", rank_val).alias("cheapest_order"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ';' ORDER BY l_linestatus) AS statuses,
           CAST(count(DISTINCT l_linestatus) AS INT) AS n_statuses
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set made deterministic: the set aggregate is sorted then
    joined, so the output is engine-portable despite collect_set's
    undefined element order — the pattern for any list-valued aggregate
    that must survive a value-hash comparison."""
    li = table(spark, sf_dir, "lineitem")
    statuses = F.array_sort(F.collect_set("l_linestatus"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.array_join(statuses, ";").alias("statuses"),
            F.size(statuses).alias("n_statuses"),
        )
        .orderBy("l_returnflag")
    )
