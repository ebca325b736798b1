"""Ninth relational pack: the skyline (Pareto-frontier) operator, the
two-phase hot-group top-k, and an exact-moment closed-form two-feature
OLS — round-11 additions that each pin a 100 TB posture claim with a
bit-exact oracle.

Plan notes:
- the skylines never plan the naive all-pairs theta join (the DuckDB
  oracle IS that quadratic NOT EXISTS form — the gate proves the
  two-phase rewrite is semantics-preserving, the same pattern as
  scale_salted_agg vs its plain-group-by oracle);
- the two-phase top-k's only window ranks <= k-per-partition partials,
  never raw rows (the KMV bottom-k lesson generalized to arbitrary
  (order, k) specs);
- the OLS accumulates EXACT integer moment sums (one map-side-combined
  exchange), so the closed-form solve is bit-identical in any engine —
  no FP-summation-order hazard at all.

Reference parity: none (the reference has no skyline / top-k / weighted
quantile / regression surface — SURVEY.md §2.12 gap families; scale and
LLM-data operators from the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators import scale
from ..operators.skyline import skyline, skyline_2d
from .registry import register

_SKYLINE_DOMINATED = """
    EXISTS (
        SELECT 1 FROM part s
        WHERE {same_group}
              s.p_retailprice <= r.p_retailprice AND s.p_size >= r.p_size
          AND (s.p_retailprice < r.p_retailprice OR s.p_size > r.p_size)
    )
"""


@register(
    "skyline_price_size",
    oracle=f"""
    SELECT p_partkey, p_brand,
           (floor((p_retailprice) * 100.0 + 0.5) / 100.0) AS price, p_size
    FROM part r
    WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
      AND NOT {_SKYLINE_DOMINATED.format(same_group="")}
    """,
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier (minimize price, maximize size): the
    parts for which no part is both cheaper-or-equal and
    larger-or-equal with one strict. The oracle is the textbook
    quadratic NOT EXISTS; the Spark plan is the two-phase local-prune
    form (operators/skyline.py) — partition-local skylines via
    mapInPandas on raw scan partitions, then an exact prev-max
    cumulation over the bounded candidate cells. The hash match proves
    the rewrite exact, ties included."""
    out = skyline_2d(
        table(spark, sf_dir, "part"), minimize="p_retailprice", maximize="p_size"
    )
    return out.select(
        "p_partkey", "p_brand", hround("p_retailprice").alias("price"), "p_size"
    )


@register(
    "skyline_price_size_by_brand",
    oracle=f"""
    SELECT p_brand, p_partkey,
           (floor((p_retailprice) * 100.0 + 0.5) / 100.0) AS price, p_size
    FROM part r
    WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
      AND NOT {_SKYLINE_DOMINATED.format(same_group="s.p_brand = r.p_brand AND")}
    """,
)
def skyline_price_size_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped skyline: the per-brand Pareto frontier on (min price,
    max size). Phase 2's window is PARTITIONED by the group and ranks
    only per-(brand, price) candidate cells from the locally-pruned
    partials — bounded per group, never raw rows."""
    out = skyline_2d(
        table(spark, sf_dir, "part"),
        minimize="p_retailprice",
        maximize="p_size",
        group_cols=["p_brand"],
    )
    return out.select(
        "p_brand", "p_partkey", hround("p_retailprice").alias("price"), "p_size"
    )


_SKY3_FEATS_SQL = """
    SELECT doc_id, lang, n_chars,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct,
           CAST(list_max(list_transform(string_split(text, ' '),
                                        x -> len(x))) AS BIGINT) AS max_tok
    FROM documents
    WHERE text IS NOT NULL AND n_chars IS NOT NULL
"""

_SKY3_DOMINATED = """
    EXISTS (
        SELECT 1 FROM f s
        WHERE {same_group}
              s.n_chars <= r.n_chars AND s.n_distinct >= r.n_distinct
          AND s.max_tok >= r.max_tok
          AND (s.n_chars < r.n_chars OR s.n_distinct > r.n_distinct
               OR s.max_tok > r.max_tok)
    )
"""


def _sky3_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document curation criteria with exact DuckDB parity: cost =
    n_chars (minimize), lexical richness = distinct whitespace tokens
    (maximize; F.split <-> string_split parity is the llm_data idiom),
    and max token length (maximize) as the long-token/noise signal."""
    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_max(F.transform(toks, lambda x: F.length(x)))
        .cast("long")
        .alias("max_tok"),
    )


@register(
    "skyline_quality_3d",
    oracle=f"""
    WITH f AS MATERIALIZED ({_SKY3_FEATS_SQL})
    SELECT doc_id, n_chars, n_distinct, max_tok
    FROM f r
    WHERE NOT {_SKY3_DOMINATED.format(same_group="")}
    """,
)
def skyline_quality_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d=3 skyline (VERDICT r11 #6): the document curation frontier on
    (minimize n_chars, maximize distinct tokens, maximize max token
    length) — real curation trades >= 3 signals, and the 2-D prev-max
    cumulation does not generalize, so phase 2 is the bounded
    candidate-set exact pass of ``operators/skyline.skyline``: the
    candidate x candidate dominance check runs INSIDE one Arrow batch
    over the locally-pruned partials (never a quadratic join in the
    plan — the oracle IS that quadratic NOT EXISTS, deliberately)."""
    out = skyline(
        _sky3_features(spark, sf_dir),
        minimize=["n_chars"],
        maximize=["n_distinct", "max_tok"],
    )
    return out.select("doc_id", "n_chars", "n_distinct", "max_tok")


@register(
    "skyline_quality_3d_by_lang",
    oracle=f"""
    WITH f AS MATERIALIZED ({_SKY3_FEATS_SQL})
    SELECT lang, doc_id, n_chars, n_distinct, max_tok
    FROM f r
    WHERE NOT {_SKY3_DOMINATED.format(same_group="s.lang = r.lang AND")}
    """,
)
def skyline_quality_3d_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language d=3 curation frontier: phase 2 gathers each
    language's bounded candidate set into its own applyInPandas task
    (the grouped twin of the single-task ungrouped pass), so the
    quadratic check is per-group in-memory and the plan stays
    join-free."""
    out = skyline(
        _sky3_features(spark, sf_dir),
        minimize=["n_chars"],
        maximize=["n_distinct", "max_tok"],
        group_cols=["lang"],
    )
    return out.select("lang", "doc_id", "n_chars", "n_distinct", "max_tok")


@register(
    "scale_topk_per_group_two_phase",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           (floor((l_extendedprice) * 100.0 + 0.5) / 100.0) AS price, rn
    FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               CAST(row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
               ) AS INT) AS rn
        FROM lineitem
    ) WHERE rn <= 5
    """,
)
def scale_topk_per_group_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 lineitems per l_returnflag — THREE grouping values, the
    shape where ``row_number().over(partitionBy(group))`` (the oracle's
    plan) collapses 100 TB into 3 sort tasks. The two-phase operator
    folds a per-partition top-5 per group on the raw scan partitions
    (<= 15 rows out per partition) and ranks only those partials; the
    oracle IS the single-window form, so the hash match proves the
    rewrite exact."""
    out = scale.two_phase_topk_per_group(
        table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
        ),
        group_cols=["l_returnflag"],
        order_spec=[
            ("l_extendedprice", False),
            ("l_orderkey", True),
            ("l_linenumber", True),
        ],
        k=5,
    )
    return out.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        hround("l_extendedprice").alias("price"),
        "rn",
    )


@register(
    "agg_ols_two_features",
    oracle="""
    WITH f AS (
        SELECT source,
               CAST(n_chars AS BIGINT) AS y,
               CAST(length(text) - length(replace(text, ' ', ''))
                    AS BIGINT) AS x1,
               CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
                    AS BIGINT) AS x2
        FROM documents
    ), m AS (
        SELECT source, count(*) AS n,
               sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
               sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
               sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
        FROM f GROUP BY source
    ), c AS (
        SELECT source, n,
               CAST(n * s11 - s1 * s1 AS DOUBLE) AS a11,
               CAST(n * s12 - s1 * s2 AS DOUBLE) AS a12,
               CAST(n * s22 - s2 * s2 AS DOUBLE) AS a22,
               CAST(n * s1y - s1 * sy AS DOUBLE) AS b1,
               CAST(n * s2y - s2 * sy AS DOUBLE) AS b2,
               CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
               CAST(sy AS DOUBLE) AS dy
        FROM m
    )
    SELECT source, CAST(n AS BIGINT) AS n,
           (floor(((a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12))
                  * 1000000.0 + 0.5) / 1000000.0) AS beta_spaces,
           (floor(((a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12))
                  * 1000000.0 + 0.5) / 1000000.0) AS beta_vowels,
           (floor(((dy - ((a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12)) * d1
                       - ((a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12)) * d2)
                   / n) * 10000.0 + 0.5) / 10000.0) AS intercept
    FROM c
    WHERE a11 * a22 - a12 * a12 <> 0
    """,
)
def agg_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature closed-form OLS per source: n_chars modeled on
    space-count and vowel-count (normal equations via Cramer's rule).
    The moment sums are EXACT BIGINT accumulations — order-independent,
    so the double-precision solve is bit-identical in any engine (no
    FP-summation-order hazard, unlike naive double sums). One map-side-
    combined exchange on the group key; the solve is a per-group scalar
    expression. The binding term for int64 range is the scaled
    covariance n * s_xy (here ~1e13 at 1e6 rows per group, saturating
    around ~1e8.5 rows per group for these feature magnitudes) — past
    that, promote the moment sums to DECIMAL(38,0); under ANSI mode the
    overflow fails loud, never silently wraps. Singular groups (zero
    determinant) are excluded, matching the oracle."""
    docs = table(spark, sf_dir, "documents")
    f = docs.select(
        "source",
        F.col("n_chars").cast("long").alias("y"),
        (F.length("text") - F.length(F.expr("replace(text, ' ', '')")))
        .cast("long")
        .alias("x1"),
        (F.length("text") - F.length(F.regexp_replace("text", "[aeiou]", "")))
        .cast("long")
        .alias("x2"),
    )
    m = f.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    c = m.select(
        "source",
        "n",
        (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1"))
        .cast("double")
        .alias("a11"),
        (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2"))
        .cast("double")
        .alias("a12"),
        (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2"))
        .cast("double")
        .alias("a22"),
        (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy"))
        .cast("double")
        .alias("b1"),
        (F.col("n") * F.col("s2y") - F.col("s2") * F.col("sy"))
        .cast("double")
        .alias("b2"),
        F.col("s1").cast("double").alias("d1"),
        F.col("s2").cast("double").alias("d2"),
        F.col("sy").cast("double").alias("dy"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    beta1 = (F.col("a22") * F.col("b1") - F.col("a12") * F.col("b2")) / det
    beta2 = (F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1")) / det
    icept = (F.col("dy") - beta1 * F.col("d1") - beta2 * F.col("d2")) / F.col("n")
    return c.where(det != 0).select(
        "source",
        F.col("n").cast("long").alias("n"),
        hround(beta1, 6).alias("beta_spaces"),
        hround(beta2, 6).alias("beta_vowels"),
        hround(icept, 4).alias("intercept"),
    )


_WQ_PROBS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _wq_oracle() -> str:
    probs = ", ".join(repr(p) for p in _WQ_PROBS)
    return f"""
    WITH vg AS (
      SELECT l_extendedprice AS v, sum(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
      GROUP BY 1
    ), cdf AS (
      SELECT v, sum(w) OVER (ORDER BY v) AS cw FROM vg
    ), tot AS (SELECT sum(w) AS tw FROM vg)
    SELECT p.prob,
           (floor((min(c.v)) * 100.0 + 0.5) / 100.0) AS value
    FROM (SELECT CAST(unnest([{probs}]) AS DOUBLE) AS prob) p
    CROSS JOIN tot t
    JOIN cdf c ON CAST(c.cw AS DOUBLE) >= p.prob * CAST(t.tw AS DOUBLE)
    GROUP BY p.prob
    """


@register("agg_weighted_quantiles_exact", oracle=_wq_oracle())
def agg_weighted_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantity-weighted price quantiles — min{{v : cumweight(v)
    >= p*W}} — via the carried-prefix-sum CDF (scale.exact_weighted_
    quantiles): range-partitioned per-partition running sums plus a
    one-row-per-partition carried offset, so no global sort and no
    single-task window ever sees the value grain. The weight is cast to
    BIGINT before summing (exact, order-independent — the threshold
    comparison is bit-stable across engines); the oracle is the naive
    single-window cumulative form."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    out = scale.exact_weighted_quantiles(li, "v", "w", _WQ_PROBS)
    return out.select("prob", hround("value").alias("value"))


_GWQ_PROBS = [0.25, 0.5, 0.9]


def _gwq_oracle() -> str:
    probs = ", ".join(repr(p) for p in _GWQ_PROBS)
    return f"""
    WITH vg AS (
      SELECT l_returnflag, l_extendedprice AS v,
             sum(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
      GROUP BY 1, 2
    ), cdf AS (
      SELECT l_returnflag, v,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM vg
    )
    SELECT c.l_returnflag, p.prob,
           (floor((min(c.v)) * 100.0 + 0.5) / 100.0) AS value
    FROM (SELECT CAST(unnest([{probs}]) AS DOUBLE) AS prob) p
    JOIN cdf c ON CAST(c.cw AS DOUBLE) >= p.prob * CAST(c.tw AS DOUBLE)
    GROUP BY c.l_returnflag, p.prob
    """


@register("agg_weighted_quantiles_by_group", oracle=_gwq_oracle())
def agg_weighted_quantiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag quantity-weighted price quantiles, EXACT, with no
    per-group ordered window over the value grain (the oracle's plan —
    a cumulative window partitioned by the group — puts each group's
    whole distinct-price set in one sort task; three flags over 100 TB
    is three tasks). One global carried prefix sum in (group, value)
    order recovers per-group cumulatives arithmetically via tie-free
    per-group offsets; every (group, prob) answer is a conditional-min
    aggregate. Integer weight sums keep thresholds bit-stable."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    out = scale.exact_weighted_quantiles_grouped(
        li, ["l_returnflag"], "v", "w", _GWQ_PROBS
    )
    return out.select("l_returnflag", "prob", hround("value").alias("value"))


_WINS_LO, _WINS_HI = 0.05, 0.95


@register(
    "agg_winsorized_mean_by_flag",
    oracle=f"""
    WITH vg AS (
      SELECT l_returnflag, l_extendedprice AS v, count(*) AS w
      FROM lineitem WHERE l_extendedprice IS NOT NULL
      GROUP BY 1, 2
    ), cdf AS (
      SELECT l_returnflag, v,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM vg
    ), cuts AS (
      SELECT l_returnflag,
             min(v) FILTER (WHERE CAST(cw AS DOUBLE)
                                  >= {_WINS_LO!r} * CAST(tw AS DOUBLE)) AS lo,
             min(v) FILTER (WHERE CAST(cw AS DOUBLE)
                                  >= {_WINS_HI!r} * CAST(tw AS DOUBLE)) AS hi
      FROM cdf GROUP BY 1
    )
    SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
           (floor(avg(least(greatest(l.l_extendedprice, c.lo), c.hi))
                  * 10000.0 + 0.5) / 10000.0) AS winsorized_mean
    FROM lineitem l JOIN cuts c ON c.l_returnflag = l.l_returnflag
    WHERE l.l_extendedprice IS NOT NULL
    GROUP BY l.l_returnflag
    """,
)
def agg_winsorized_mean_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag winsorized mean (outliers CLAMPED to the exact p05/p95,
    not dropped — the robust-mean companion of agg_trimmed_mean_exact,
    which drops them): the cut points come from the grouped carried-CDF
    exact quantiles (no per-group ordered window over the value grain),
    ride one broadcast row per group through a null-safe join, and the
    clamp + mean is a single grouped aggregate. The oracle computes the
    same lower quantiles from a per-group cumulative window."""
    from ..operators.sketches import _join_null_safe

    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice").isNotNull()
    )
    vw = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.lit(1).cast("long").alias("w"),
    )
    qs = scale.exact_weighted_quantiles_grouped(
        vw, ["l_returnflag"], "v", "w", [_WINS_LO, _WINS_HI]
    )
    cuts = qs.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("prob") == _WINS_LO, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("prob") == _WINS_HI, F.col("value"))).alias("hi"),
    )
    joined = _join_null_safe(li, F.broadcast(cuts), ["l_returnflag"])
    clamped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        hround(F.avg(clamped), 4).alias("winsorized_mean"),
    )


_MAD_K = 3.0 * 1.4826  # robust z cutoff: k * the normal-consistency const


@register(
    "agg_mad_outliers_by_flag",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT l_returnflag AS g, l_extendedprice AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), ranked AS (
      SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM base
    ), med AS (
      SELECT g, v AS med FROM ranked
      WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
    ), dev AS (
      SELECT b.g, abs(b.v - m.med) AS d, m.med
      FROM base b JOIN med m USING (g)
    ), dranked AS (
      SELECT g, d, row_number() OVER (PARTITION BY g ORDER BY d) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM dev
    ), mad AS (
      SELECT g, d AS mad FROM dranked
      WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
    )
    SELECT dev.g AS l_returnflag, dev.med AS med, mad.mad AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE dev.d > {_MAD_K!r} * mad.mad)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (g)
    GROUP BY 1, 2, 3
    """,
)
def agg_mad_outliers_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier statistics per l_returnflag: lower median, MAD,
    and the count beyond 3 x 1.4826 x MAD — the heavy-tail-safe twin of
    the mean/stddev z-score. Both median passes are carried-CDF weighted
    lower quantiles over the (group, value, count) grain (one raw scan,
    no per-group ordered window over raw rows); the oracle replays the
    lower median as the order statistic at ceil(0.5 n) — equivalent to
    min{{v : cum >= 0.5 W}} — and every output is a selected value or an
    integer count, so the match is bit-exact with no rounding shim."""
    li = table(spark, sf_dir, "lineitem")
    out = scale.grouped_mad_outliers(li, ["l_returnflag"], "l_extendedprice")
    return out.select(
        "l_returnflag", "med", "mad", "n", "n_outliers"
    )
