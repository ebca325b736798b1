"""Fifteenth relational pack: distributed ORDER STATISTICS on the
carried-prefix-sum primitive (operators/scale.carried_cumsum) — the
round-6 family built on the same range-partition + carried-offset shape
that replaced the repo's last single-task sorts.

- ``agg_exact_median_parallel``: exact (interpolated) median from the
  value-grain CDF — min value whose cumulative count reaches the k-th
  order statistic; no global sort, no driver-side percentile buffer
  (Spark's builtin exact ``percentile`` aggregates every value into one
  in-memory buffer per group — fine for small groups, a scale-killer for
  a 10^12-row column).
- ``stat_mannwhitney_u``: Mann-Whitney U with average ranks for ties and
  the tie-corrected normal approximation. Ranks come from the pooled
  value-grain cumulative counts; every rank-sum is computed in INTEGER
  space (2x the half-integer average ranks), so the statistic is exact
  and partition-order independent — no floating-point drift for the
  oracle hash to trip on.
- ``stat_ks_two_sample``: Kolmogorov-Smirnov D as the max |CDF_A -
  CDF_B| over pooled distinct values, computed as an integer cross
  difference |cumA*nB - cumB*nA| then divided once — exact, with the
  deterministic argmax location.
- ``stat_welch_ttest``: Welch's t and Satterthwaite df from exact
  integer sums/sums-of-squares (n_chars is integral), so the two-group
  comparison is bit-stable across engines and partitionings.
- ``agg_grouped_median_exact``: the per-group variant — each group's CDF
  cumsum runs in a window PARTITIONED by the group key over the compact
  value grain.
- ``agg_exact_quantiles_parallel``: the generalization — a
  quantile_cont-compatible probability vector from one CDF pass.
- plus the business-analytics faces of the same machinery:
  ``customer_rfm_segmentation`` (three exact_ntile quintiles),
  ``customer_pareto_concentration`` (80/20 revenue prefix via carried
  cumsum + global ranks, integer-exact boundary),
  ``part_affinity_lift`` (market-basket lift, grouped-basket in-array
  pair expansion), and ``events_activity_islands`` (gaps-and-islands
  longest streaks, user-partitioned).

Reference parity: none (no statistics in the reference — SURVEY.md §2.5
gap surface). All oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators.scale import carried_cumsum
from .registry import register


@register(
    "agg_exact_median_parallel",
    oracle="""
    SELECT (floor(median(l_extendedprice) * 1000000.0 + 0.5) / 1000000.0)
             AS median_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    """,
)
def agg_exact_median_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median of l_extendedprice with NO global sort:
    value-grain counts -> carried prefix sums (range-partitioned) -> the
    k-th order statistic is the MIN value whose cumulative count reaches
    k; even n averages the two middle order statistics exactly like
    quantile_cont(0.5). The total is the CDF's own final value — a
    1-row aggregate broadcast, no second scan of the base table.

    Null contract: l_extendedprice is NOT NULL by TPC-H schema; on a
    nullable column add ``isNotNull`` before the value-grain groupBy
    (as operators.scale.exact_quantiles does) to match median()."""
    li = table(spark, sf_dir, "lineitem")
    vg = li.groupBy(F.col("l_extendedprice").alias("p")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cdf = carried_cumsum(vg, "p", ["c"])
    # n = the CDF's final value — no second scan of lineitem
    tot = cdf.agg(F.max("cum_c").alias("n"))
    k1 = F.floor((F.col("n") + 1) / 2).cast("long")  # lower middle order stat
    k2 = F.floor((F.col("n") + 2) / 2).cast("long")  # upper middle order stat
    return (
        cdf.crossJoin(F.broadcast(tot))
        .agg(
            hround(
                (
                    F.min(F.when(F.col("cum_c") >= k1, F.col("p")))
                    + F.min(F.when(F.col("cum_c") >= k2, F.col("p")))
                )
                / 2.0,
                6,
            ).alias("median_price"),
            F.max("n").alias("n"),
        )
    )


@register(
    "stat_mannwhitney_u",
    oracle="""
    WITH vals AS (
      SELECT o_totalprice AS p,
             CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM orders WHERE o_orderstatus IN ('O', 'F')
      GROUP BY o_totalprice
    ), cdf AS (
      SELECT p, ca, cb, ca + cb AS c,
             sum(ca + cb) OVER (ORDER BY p) AS cum
      FROM vals
    ), tots AS (
      SELECT sum(ca) AS na, sum(cb) AS nb FROM vals
    ), s AS (
      SELECT sum(ca * (2 * cum - c + 1)) AS r2a,
             sum((c * c * c) - c) AS ties
      FROM cdf
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           (floor(((r2a - na * (na + 1)) / 2.0) * 100.0 + 0.5) / 100.0) AS u_a,
           (floor((na * nb - (r2a - na * (na + 1)) / 2.0) * 100.0 + 0.5) / 100.0)
             AS u_b,
           (floor((((r2a - na * (na + 1)) / 2.0 - na * nb / 2.0)
                   / sqrt(na * nb / 12.0 * ((na + nb + 1.0)
                          - ties / ((na + nb) * (na + nb - 1.0)))))
                  * 1000000.0 + 0.5) / 1000000.0) AS z
    FROM s CROSS JOIN tots
    """,
)
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U ('O' vs 'F' order totals) with average ranks for
    ties, entirely in integer space: avg rank of a tied value is the
    half-integer (cum - c + (c+1)/2), so 2*R_A = sum(ca * (2*cum - c +
    1)) is an exact BIGINT — the rank-sum is partition-order independent
    by construction, not by tolerance. Tie-corrected sigma for the
    normal approximation; pooled CDF from carried_cumsum (no global
    window)."""
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus").isin("O", "F")
    )
    vg = o.groupBy(F.col("o_totalprice").alias("p")).agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    cdf = carried_cumsum(
        vg.withColumn("c", F.col("ca") + F.col("cb")), "p", ["c"]
    )
    s = cdf.agg(
        F.sum(F.col("ca") * (2 * F.col("cum_c") - F.col("c") + 1)).alias("r2a"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("ties"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    na, nb, r2a, ties = F.col("na"), F.col("nb"), F.col("r2a"), F.col("ties")
    ua = (r2a - na * (na + 1)) / 2.0
    mu = na * nb / 2.0
    sigma = F.sqrt(
        na * nb / 12.0 * ((na + nb + 1.0) - ties / ((na + nb) * (na + nb - 1.0)))
    )
    return s.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        hround(ua, 2).alias("u_a"),
        hround(na * nb - ua, 2).alias("u_b"),
        hround((ua - mu) / sigma, 6).alias("z"),
    )


@register(
    "stat_ks_two_sample",
    oracle="""
    WITH vals AS (
      SELECT value AS v,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS ca,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS cb
      FROM events WHERE event_type IN ('click', 'error') AND value IS NOT NULL
      GROUP BY value
    ), cdf AS (
      SELECT v, sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb
      FROM vals WINDOW w AS (ORDER BY v)
    ), tots AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM vals),
    diffs AS (
      SELECT v, abs(cuma * nb - cumb * na) AS x
      FROM cdf CROSS JOIN tots
    )
    SELECT CAST(tots.na AS BIGINT) AS n_a, CAST(tots.nb AS BIGINT) AS n_b,
           (floor((best.x * 1.0 / (tots.na * tots.nb)) * 1000000.0 + 0.5)
            / 1000000.0) AS d_stat,
           best.v AS d_at
    FROM tots, (SELECT x, v FROM diffs ORDER BY x DESC, v ASC LIMIT 1) best
    """,
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between click and error value
    distributions: pooled value-grain CDFs via carried_cumsum, the sup
    taken over the INTEGER cross difference |cumA*nB - cumB*nA| (exact;
    one division at the end), argmax location tie-broken to the smallest
    value via a lexicographic struct max."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "error") & F.col("value").isNotNull()
    )
    vg = e.groupBy(F.col("value").alias("v")).agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("ca"),
        F.sum((F.col("event_type") == "error").cast("int")).cast("long").alias("cb"),
    )
    cdf = carried_cumsum(vg, "v", ["ca", "cb"])
    s = cdf.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    diffs = cdf.crossJoin(F.broadcast(s)).select(
        "na",
        "nb",
        F.abs(F.col("cum_ca") * F.col("nb") - F.col("cum_cb") * F.col("na")).alias("x"),
        "v",
    )
    best = diffs.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max(F.struct(F.col("x"), (-F.col("v")).alias("nv"))).alias("s"),
    )
    return best.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        hround(F.col("s.x") * 1.0 / (F.col("na") * F.col("nb")), 6).alias("d_stat"),
        (-F.col("s.nv")).alias("d_at"),
    )


@register(
    "stat_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
      FROM documents WHERE lang IN ('en', 'de')
      GROUP BY lang
    ), w AS (
      SELECT max(CASE WHEN lang = 'en' THEN n END) AS n1,
             max(CASE WHEN lang = 'en' THEN s END) AS s1,
             max(CASE WHEN lang = 'en' THEN ss END) AS ss1,
             max(CASE WHEN lang = 'de' THEN n END) AS n2,
             max(CASE WHEN lang = 'de' THEN s END) AS s2,
             max(CASE WHEN lang = 'de' THEN ss END) AS ss2
      FROM g
    ), d AS (
      SELECT n1, n2,
             s1 * 1.0 / n1 AS m1, s2 * 1.0 / n2 AS m2,
             (ss1 - s1 * 1.0 * s1 / n1) / (n1 - 1) AS v1,
             (ss2 - s2 * 1.0 * s2 / n2) / (n2 - 1) AS v2
      FROM w
    )
    SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n2 AS BIGINT) AS n_de,
           (floor(m1 * 1000000.0 + 0.5) / 1000000.0) AS mean_en,
           (floor(m2 * 1000000.0 + 0.5) / 1000000.0) AS mean_de,
           (floor(((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) * 1000000.0 + 0.5)
            / 1000000.0) AS t_stat,
           (floor((power(v1 / n1 + v2 / n2, 2)
                   / (power(v1 / n1, 2) / (n1 - 1) + power(v2 / n2, 2) / (n2 - 1)))
                  * 1000000.0 + 0.5) / 1000000.0) AS df
    FROM d
    """,
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (en vs de document lengths): the
    group moments come from exact BIGINT sums and sums-of-squares
    (n_chars is integral), so mean/variance/t/df are single deterministic
    double expressions over exact integers — no merge-order variance
    drift, no tolerance needed. Satterthwaite df alongside t."""
    d = table(spark, sf_dir, "documents").where(F.col("lang").isin("en", "de"))
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("ss"),
    )
    w = g.agg(
        F.max(F.when(F.col("lang") == "en", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("lang") == "en", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("lang") == "en", F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("lang") == "de", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("lang") == "de", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("lang") == "de", F.col("ss"))).alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1, m2 = F.col("s1") * 1.0 / n1, F.col("s2") * 1.0 / n2
    v1 = (F.col("ss1") - F.col("s1") * 1.0 * F.col("s1") / n1) / (n1 - 1)
    v2 = (F.col("ss2") - F.col("s2") * 1.0 * F.col("s2") / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    dfree = F.pow(se2, 2) / (
        F.pow(v1 / n1, 2) / (n1 - 1) + F.pow(v2 / n2, 2) / (n2 - 1)
    )
    return w.select(
        n1.alias("n_en"),
        n2.alias("n_de"),
        hround(m1, 6).alias("mean_en"),
        hround(m2, 6).alias("mean_de"),
        hround((m1 - m2) / F.sqrt(se2), 6).alias("t_stat"),
        hround(dfree, 6).alias("df"),
    )


@register(
    "agg_grouped_median_exact",
    oracle="""
    SELECT o_orderpriority,
           (floor(median(o_totalprice) * 1000000.0 + 0.5) / 1000000.0)
             AS median_price,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_grouped_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group interpolated median WITHOUT Spark's builtin exact
    ``percentile`` (which buffers every group value in one in-memory
    OpenHashMap per group — a scale-killer for a billion-row group).
    Plan: value-grain counts per (group, value), a PARTITIONED window
    cumsum over the value grain (each group's CDF is independent, so the
    window partitions by group — no unpartitioned window anywhere), then
    the two middle order statistics selected arithmetically exactly as
    agg_exact_median_parallel does globally. Window input is the
    value-grain table (distinct values per group), already the compact
    form of the data."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    vg = o.groupBy(
        F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("p")
    ).agg(F.count(F.lit(1)).alias("c"))
    cum_w = W.partitionBy("g").orderBy("p").rowsBetween(W.unboundedPreceding, 0)
    cdf = vg.withColumn("cum", F.sum("c").over(cum_w))
    # per-group n = each group's final CDF value — no second orders scan
    tot = cdf.groupBy("g").agg(F.max("cum").alias("n"))
    k1 = F.floor((F.col("n") + 1) / 2).cast("long")
    k2 = F.floor((F.col("n") + 2) / 2).cast("long")
    return (
        cdf.join(tot, "g")
        .groupBy("g", "n")
        .agg(
            hround(
                (
                    F.min(F.when(F.col("cum") >= k1, F.col("p")))
                    + F.min(F.when(F.col("cum") >= k2, F.col("p")))
                )
                / 2.0,
                6,
            ).alias("median_price")
        )
        .select(F.col("g").alias("o_orderpriority"), "median_price", "n")
        .orderBy("o_orderpriority")
    )


@register(
    "agg_exact_quantiles_parallel",
    oracle="""
    WITH q AS (
      SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS prob,
             unnest(quantile_cont(l_extendedprice,
                                  [0.25, 0.5, 0.75, 0.9, 0.99])) AS v
      FROM lineitem
    )
    SELECT CAST(prob AS DOUBLE) AS prob,
           (floor(v * 1000000.0 + 0.5) / 1000000.0) AS value
    FROM q ORDER BY prob
    """,
)
def agg_exact_quantiles_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantile VECTOR (p25/p50/p75/p90/p99) from ONE
    value-grain CDF pass (operators/scale.exact_quantiles) — the CBO
    statistics primitive at its full generality, matching quantile_cont
    bit-for-bit while approx_percentile remains the documented sketch
    tier. All five probabilities share the same carried prefix sums; no
    global sort, no per-group in-memory buffer."""
    from ..operators.scale import exact_quantiles

    li = table(spark, sf_dir, "lineitem")
    out = exact_quantiles(li, "l_extendedprice", [0.25, 0.5, 0.75, 0.9, 0.99])
    return out.select("prob", hround("value", 6).alias("value")).orderBy("prob")


@register(
    "customer_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS c,
             date_diff('day', max(o_orderdate), TIMESTAMP '2001-09-01') AS rec,
             CAST(count(*) AS BIGINT) AS freq,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT c, cents,
             ntile(5) OVER (ORDER BY rec, c) AS r,
             ntile(5) OVER (ORDER BY freq DESC, c) AS f,
             ntile(5) OVER (ORDER BY cents DESC, c) AS m
      FROM rfm
    )
    SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
           CAST(count(*) AS BIGINT) AS n_customers,
           (floor((sum(cents) * 1.0 / count(*) / 100.0) * 100.0 + 0.5) / 100.0)
             AS avg_monetary
    FROM scored GROUP BY r, f, m ORDER BY r, f, m
    """,
)
def customer_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic marketing quintile cube — with all three quintiles computed
    by scale.exact_ntile over the customer-grain table (data-scale at
    real customer counts: no single-task ntile window anywhere; bucket 1
    = best on each axis, ties broken by custkey). Monetary is summed in
    exact BIGINT cents; the output is the segment census with average
    spend. The recency anchor is a fixed literal so both engines
    subtract the same date."""
    from ..operators.scale import exact_ntile

    o = table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.datediff(
            F.lit("2001-09-01").cast("date"), F.max(F.col("o_orderdate").cast("date"))
        ).alias("rec"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")).alias("cents"),
    )
    s = exact_ntile(rfm, ["rec", "c"], 5, bucket_name="r")
    s = exact_ntile(s, [F.col("freq").desc(), "c"], 5, bucket_name="f")
    s = exact_ntile(s, [F.col("cents").desc(), "c"], 5, bucket_name="m")
    return (
        s.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            hround(F.sum("cents") * 1.0 / F.count(F.lit(1)) / 100.0, 2).alias(
                "avg_monetary"
            ),
        )
        .orderBy("r", "f", "m")
    )


@register(
    "part_affinity_lift",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM basket),
    supp AS (
      SELECT p, CAST(count(*) AS BIGINT) AS s FROM basket GROUP BY p
    ), pairs AS (
      SELECT a.p AS p_a, b.p AS p_b, CAST(count(*) AS BIGINT) AS c_ab
      FROM basket a JOIN basket b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT p_a, p_b, c_ab,
           (floor((c_ab * 1.0 * n.n_orders / (sa.s * sb.s)) * 1000000.0 + 0.5)
            / 1000000.0) AS lift
    FROM pairs
    JOIN supp sa ON sa.p = p_a
    JOIN supp sb ON sb.p = p_b
    CROSS JOIN n
    ORDER BY lift DESC, p_a, p_b LIMIT 100
    """,
)
def part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association lift between parts co-occurring in an
    order: lift(a,b) = P(ab) / (P(a) P(b)), support-filtered, top-100 by
    lift. Pair generation reuses the grouped-posting shape — baskets
    collapse to sorted distinct part ARRAYS (bounded by order width, ~13
    here) and pairs expand in-array, so the exchange carries one row per
    order, never a quadratic self-join; supports join back on the part
    key. The lift ratio is one division of exact integers. At 100 TB
    width-cap the basket array exactly like max_shingle_freq caps
    postings."""
    li = table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    n = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    supp = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("p_a"), y.alias("p_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pp"))
        .groupBy("pp.p_a", "pp.p_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= 3)
    )
    sa = supp.select(F.col("p").alias("p_a"), F.col("s").alias("sa"))
    sb = supp.select(F.col("p").alias("p_b"), F.col("s").alias("sb"))
    return (
        pairs.join(sa, "p_a")
        .join(sb, "p_b")
        .crossJoin(F.broadcast(n))
        .select(
            "p_a",
            "p_b",
            "c_ab",
            hround(
                F.col("c_ab") * 1.0 * F.col("n_orders") / (F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "p_a", "p_b")
        .limit(100)
    )


@register(
    "events_activity_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), grp AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                        AS INT) AS anchor
      FROM days
    ), islands AS (
      SELECT user_id, min(day) AS streak_start,
             CAST(count(*) AS BIGINT) AS streak_days
      FROM grp GROUP BY user_id, anchor
    ), best AS (
      SELECT user_id, streak_start, streak_days,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC, streak_start) AS rn
      FROM islands
    )
    SELECT user_id, streak_start, streak_days
    FROM best WHERE rn = 1 ORDER BY user_id
    """,
)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days (earliest on ties) — the canonical streak/retention shape. The
    island key is the classic ``day - row_number`` anchor (consecutive
    days share it); every window partitions by user_id, so the plan is
    one exchange on the user key and stays partition-parallel at any
    user count."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "anchor", F.date_sub("day", F.row_number().over(w))
    )
    islands = grp.groupBy("user_id", "anchor").agg(
        F.min("day").alias("streak_start"), F.count(F.lit(1)).alias("streak_days")
    )
    bw = W.partitionBy("user_id").orderBy(F.desc("streak_days"), "streak_start")
    return (
        islands.withColumn("rn", F.row_number().over(bw))
        .where(F.col("rn") == 1)
        .select("user_id", "streak_start", "streak_days")
        .orderBy("user_id")
    )


@register(
    "customer_pareto_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS c,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT c, cents,
             sum(cents) OVER (ORDER BY cents DESC, c) AS cum_cents,
             row_number() OVER (ORDER BY cents DESC, c) AS rnk
      FROM rev
    ), tot AS (
      SELECT sum(cents) AS total, count(*) AS n_cust FROM rev
    )
    SELECT CAST(min(rnk) AS BIGINT) AS customers_to_80pct,
           CAST(max(tot.n_cust) AS BIGINT) AS n_customers,
           (floor((min(rnk) * 1.0 / max(tot.n_cust)) * 1000000.0 + 0.5)
            / 1000000.0) AS customer_share
    FROM ranked CROSS JOIN tot
    WHERE cum_cents * 5 >= total * 4
    """,
)
def customer_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/80-20 revenue concentration: the smallest top-revenue
    customer prefix covering >= 80% of total revenue. Revenue ranks and
    cumulative sums come from ONE carried_cumsum + global_row_ids pass
    over the customer grain (both range-partitioned — no single-task
    revenue sort at any customer count); the 80% test is the integer
    comparison cum*5 >= total*4 on exact BIGINT cents, so the boundary
    cannot drift between engines."""
    from ..operators.scale import carried_cumsum, global_row_ids

    o = table(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")).alias("cents")
    )
    keys = [F.col("cents").desc(), "c"]
    ranked = global_row_ids(
        carried_cumsum(rev, keys, ["cents"]), keys, id_name="rnk"
    )
    tot = rev.agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).cast("long").alias("n_cust")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .where(F.col("cum_cents") * 5 >= F.col("total") * 4)
        .agg(
            F.min("rnk").alias("customers_to_80pct"),
            F.max("n_cust").alias("n_customers"),
            hround(F.min("rnk") * 1.0 / F.max("n_cust"), 6).alias("customer_share"),
        )
    )


@register(
    "agg_trimmed_mean_exact",
    oracle="""
    WITH vals AS (
      SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), cdf AS (
      SELECT cents, c, sum(c) OVER (ORDER BY cents) AS cum FROM vals
    ), tot AS (
      SELECT sum(c) AS n,
             CAST(floor(sum(c) * 0.1) AS BIGINT) + 1 AS k_lo,
             sum(c) - CAST(floor(sum(c) * 0.1) AS BIGINT) AS k_hi
      FROM vals
    ), ov AS (
      SELECT cents,
             greatest(0, least(cum, k_hi) - greatest(cum - c + 1, k_lo) + 1)
               AS keep
      FROM cdf CROSS JOIN tot
    )
    SELECT (floor((sum(cents * keep) * 1.0
                   / (100.0 * (max(tot.k_hi) - max(tot.k_lo) + 1)))
                  * 1000000.0 + 0.5) / 1000000.0) AS trimmed_mean,
           CAST(max(tot.n) AS BIGINT) AS n,
           CAST(max(tot.k_hi) - max(tot.k_lo) + 1 AS BIGINT) AS n_kept
    FROM ov CROSS JOIN tot
    """,
)
def agg_trimmed_mean_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-trimmed mean of extended price — the robust-location
    statistic between mean and median — computed fully in parallel and
    fully in INTEGER space: prices to BIGINT cents, per-distinct-value
    rank intervals [cum-c+1, cum] from carried_cumsum, each value keeps
    the overlap of its interval with the trim window [k_lo, k_hi], and
    the kept mass sum(cents * keep) is an exact BIGINT (bounded by
    max_cents * n ~ 1e12 here). One division at the end — no float
    summation anywhere, so no cross-engine drift and no global sort."""
    li = table(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long").alias("cents")
    ).agg(F.count(F.lit(1)).alias("c"))
    cdf = carried_cumsum(vals, "cents", ["c"])
    tot = cdf.agg(F.max("cum_c").alias("n")).select(
        "n",
        (F.floor(F.col("n") * 0.1).cast("long") + 1).alias("k_lo"),
        (F.col("n") - F.floor(F.col("n") * 0.1).cast("long")).alias("k_hi"),
    )
    keep = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum_c"), F.col("k_hi"))
        - F.greatest(F.col("cum_c") - F.col("c") + 1, F.col("k_lo"))
        + 1,
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .select("cents", "n", "k_lo", "k_hi", keep.alias("keep"))
        .agg(
            hround(
                F.sum(F.col("cents") * F.col("keep"))
                * 1.0
                / (100.0 * (F.max("k_hi") - F.max("k_lo") + 1)),
                6,
            ).alias("trimmed_mean"),
            F.max("n").alias("n"),
            (F.max("k_hi") - F.max("k_lo") + 1).alias("n_kept"),
        )
    )
