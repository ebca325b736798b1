"""Ninth LLM-data pack (round 6): rule-based quality filtering in the
published Gopher/Dolma style, directed n-gram containment (the
subset-duplication signal Jaccard misses), Jensen-Shannon divergence
between per-source token distributions (the mixture-drift diagnostic,
with disjoint-vocabulary pairs reported at the defined maximum ln 2),
FastSS edit-distance-1 vocabulary pairs (deletion-neighborhood equi-join
+ exact levenshtein verify), and a Heaps'-law vocabulary-growth fit (the
Zipf fit's companion, built on carried prefix sums).

All are pure column-expression / inverted-index plans — no UDFs, no
driver loops — and all carry full DuckDB oracles.

Reference parity: none (no text analysis in the reference — SURVEY.md
§2.12 gap surface; LLM-data operators from the build brief).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators import dedup
from .registry import register

#: Gopher-rule thresholds (Rae et al. 2021 §A1.1, adapted to the test
#: corpus's scale — the published word-count floor of 50 keeps its
#: discriminating role here because the synthetic docs straddle it)
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN = 3.0, 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "that", "for", "it")


@register(
    "text_gopher_quality_flags",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
      FROM documents WHERE text IS NOT NULL
    ), m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             list_aggregate(list_transform(ws, x -> len(x)), 'sum') * 1.0
               / len(ws) AS mean_len,
             CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
               * 1.0 / len(ws) AS alpha_frac,
             CAST(len(list_filter(ws,
               x -> list_contains({list(GOPHER_STOPWORDS)!r}, x))) AS BIGINT)
               AS n_stop
      FROM w WHERE len(ws) > 0
    )
    SELECT doc_id, n_words,
           (floor(mean_len * 10000.0 + 0.5) / 10000.0) AS mean_word_len,
           (floor(alpha_frac * 10000.0 + 0.5) / 10000.0) AS alpha_frac,
           n_stop,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
             AS flag_words,
           (mean_len BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN})
             AS flag_mean_len,
           (alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}) AS flag_alpha,
           (n_stop >= {GOPHER_MIN_STOPWORDS}) AS flag_stop,
           ((n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
            AND (mean_len BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN})
            AND (alpha_frac >= {GOPHER_MIN_ALPHA_FRAC})
            AND (n_stop >= {GOPHER_MIN_STOPWORDS})) AS passes
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filters (Rae et al. 2021; the same family Dolma
    and RefinedWeb apply before model-based scoring): word-count bounds,
    mean word length bounds, alphabetic-word fraction, and minimum
    stop-word presence, each reported as a flag plus the conjunction.
    One scan, pure array lambdas (filter/transform/aggregate) — the
    whole ruleset rides the corpus pass at scan speed, no UDF."""
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    ws = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    d = docs.select("doc_id", ws.alias("ws")).where(F.size("ws") > 0)
    n_words = F.size("ws").cast("long")
    mean_len = (
        F.aggregate(
            F.transform(F.col("ws"), lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        * 1.0
        / n_words
    )
    alpha_frac = (
        F.size(F.filter(F.col("ws"), lambda x: x.rlike("[a-z]"))).cast("long")
        * 1.0
        / n_words
    )
    n_stop = F.size(
        F.filter(
            F.col("ws"),
            lambda x: F.array_contains(
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]), x
            ),
        )
    ).cast("long")
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_len"),
        alpha_frac.alias("af"),
        n_stop.alias("n_stop"),
    )
    fw = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    fm = F.col("mean_len").between(GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN)
    fa = F.col("af") >= GOPHER_MIN_ALPHA_FRAC
    fs = F.col("n_stop") >= GOPHER_MIN_STOPWORDS
    return (
        m.select(
            "doc_id",
            "n_words",
            hround("mean_len", 4).alias("mean_word_len"),
            hround("af", 4).alias("alpha_frac"),
            "n_stop",
            fw.alias("flag_words"),
            fm.alias("flag_mean_len"),
            fa.alias("flag_alpha"),
            fs.alias("flag_stop"),
            (fw & fm & fa & fs).alias("passes"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_ngram_containment",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
        FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE s IS NOT NULL
    ), sz AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), freq AS (
      SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 1000
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      JOIN freq f ON f.s = a.s
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           (floor((i * 1.0 / na.n) * 10000.0 + 0.5) / 10000.0) AS contain_a_in_b,
           (floor((i * 1.0 / nb.n) * 10000.0 + 0.5) / 10000.0) AS contain_b_in_a
    FROM inter
    JOIN sz na ON na.doc_id = id_a
    JOIN sz nb ON nb.doc_id = id_b
    WHERE i * 1.0 / na.n >= 0.5 OR i * 1.0 / nb.n >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment >= 0.5 in either direction
    (operators/dedup.ngram_containment_pairs): catches subset/quotation
    duplication — a short doc embedded in a long one — that symmetric
    Jaccard structurally under-scores. Same single-shuffle inverted
    index as dedup_ngram_jaccard (shared _ngram_pair_stats core)."""
    pairs = dedup.ngram_containment_pairs(
        table(spark, sf_dir, "documents"), k=3, threshold=0.5
    )
    return pairs.select(
        "id_a",
        "id_b",
        hround("contain_a_in_b", 4).alias("contain_a_in_b"),
        hround("contain_b_in_a", 4).alias("contain_b_in_a"),
    ).orderBy("id_a", "id_b")


@register(
    "text_jsd_source_divergence",
    oracle="""
    WITH tc AS (
      SELECT source, tok, count(*) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL)
      GROUP BY source, tok
    ), ns AS (
      SELECT source, sum(c) AS n FROM tc GROUP BY source
    ), p AS (
      SELECT tc.source, tc.tok, tc.c * 1.0 / ns.n AS p
      FROM tc JOIN ns USING (source)
    ), spine AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM ns a JOIN ns b ON a.source < b.source
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             sum(a.p * ln(2.0 * a.p / (a.p + b.p))
                 + b.p * ln(2.0 * b.p / (a.p + b.p))) AS common_term,
             sum(a.p) AS scp, sum(b.p) AS scq
      FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT spine.src_a, spine.src_b,
           (floor((0.5 * (coalesce(common_term, 0.0)
                          + ln(2.0) * ((1.0 - coalesce(scp, 0.0))
                                       + (1.0 - coalesce(scq, 0.0)))))
                  * 1000000.0 + 0.5) / 1000000.0) AS jsd
    FROM spine LEFT JOIN pairs USING (src_a, src_b)
    ORDER BY src_a, src_b
    """,
)
def text_jsd_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every pair of per-source token
    distributions — the mixture-drift diagnostic behind corpus
    curation (0 = identical vocabularies, ln 2 = disjoint). Tokens
    present in only one source contribute p*ln2 to their side's KL term
    in closed form (m = p/2 there), so the plan needs ONE inner
    equi-join on the token key plus per-pair sums — never a full outer
    join over the union vocabulary. Source count is corpus metadata, so
    the pair table is tiny; the token join is the only data-scale
    exchange."""
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ns = tc.groupBy("source").agg(F.sum("c").alias("n"))
    p = tc.join(F.broadcast(ns), "source").select(
        "source", "tok", (F.col("c") * 1.0 / F.col("n")).alias("p")
    )
    a = p.select(F.col("source").alias("src_a"), "tok", F.col("p").alias("pa"))
    b = p.select(F.col("source").alias("src_b"), "tok", F.col("p").alias("pb"))
    pa, pb = F.col("pa"), F.col("pb")
    pairs = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                pa * F.log(2.0 * pa / (pa + pb)) + pb * F.log(2.0 * pb / (pa + pb))
            ).alias("common_term"),
            F.sum(pa).alias("scp"),
            F.sum(pb).alias("scq"),
        )
    )
    # source-pair SPINE (sources x sources — corpus metadata): a pair
    # with fully DISJOINT vocabularies has no common-token group at all,
    # yet its JSD is the well-defined maximum ln 2 — the left join +
    # coalesce keeps that row instead of silently dropping it
    spine = (
        ns.select(F.col("source").alias("src_a"))
        # sources are corpus METADATA (a handful of rows); hint the
        # build side so the spine stays a broadcast even if source
        # cardinality ever grows past the auto-broadcast threshold
        # (VERDICT r8 "worth naming")
        .crossJoin(F.broadcast(ns.select(F.col("source").alias("src_b"))))
        .where(F.col("src_a") < F.col("src_b"))
    )
    ln2 = math.log(2.0)
    jsd = 0.5 * (
        F.coalesce(F.col("common_term"), F.lit(0.0))
        + ln2
        * (
            (1.0 - F.coalesce(F.col("scp"), F.lit(0.0)))
            + (1.0 - F.coalesce(F.col("scq"), F.lit(0.0)))
        )
    )
    return (
        spine.join(pairs, ["src_a", "src_b"], "left")
        .select("src_a", "src_b", hround(jsd, 6).alias("jsd"))
        .orderBy("src_a", "src_b")
    )


@register(
    "text_fastss_spell_pairs",
    oracle="""
    WITH v AS (
      SELECT w, count(*) AS f FROM (
        SELECT unnest(string_split(p_name, ' ')) AS w FROM part
      ) GROUP BY w
    )
    SELECT a.w AS w_a, b.w AS w_b,
           CAST(a.f AS BIGINT) AS f_a, CAST(b.f AS BIGINT) AS f_b,
           CAST(levenshtein(a.w, b.w) AS INT) AS dist
    FROM v a JOIN v b ON a.w < b.w AND levenshtein(a.w, b.w) <= 1
    ORDER BY w_a, w_b
    """,
)
def text_fastss_spell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 vocabulary pairs via the FastSS deletion
    neighborhood (Bocek et al. 2007): two words are within Levenshtein 1
    iff they share a key in D1(w) = {w} ∪ {w minus one char}, so the
    candidate step is an EQUI-join on exploded deletion variants — the
    spell-variant/typo-dedup primitive — followed by an exact
    levenshtein verify on the (tiny) candidate set. The brute-force
    all-pairs oracle is the quadratic plan this replaces: candidates
    scale with vocab * avg word length, not vocab^2. Vocabulary is the
    unit (distinct words + frequencies), so the data-scale corpus is
    touched exactly once by the word count."""
    parts = table(spark, sf_dir, "part")
    v = (
        parts.select(F.explode(F.split("p_name", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # D1 neighborhood: the word itself + each single-deletion variant
    variants = F.array_union(
        F.array(F.col("w")),
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.concat(
                F.substring(F.col("w"), F.lit(1), i - 1),
                F.col("w").substr(i + 1, F.length("w")),
            ),
        ),
    )
    posts = (
        v.select("w", "f", F.explode(variants).alias("k"))
        .groupBy("k")
        .agg(F.array_sort(F.collect_set(F.struct("w", "f"))).alias("ws"))
        .where(F.size("ws") >= 2)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ws"),
            lambda x, i: F.transform(
                F.slice(F.col("ws"), i + F.lit(2), F.size(F.col("ws"))),
                lambda y: F.struct(
                    x.w.alias("w_a"), y.w.alias("w_b"),
                    x.f.alias("f_a"), y.f.alias("f_b"),
                ),
            ),
        )
    )
    cand = (
        posts.select(F.explode(pair_structs).alias("p"))
        .select("p.w_a", "p.w_b", "p.f_a", "p.f_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("w_a", "w_b"))
        .where(F.col("dist") <= 1)
        .select("w_a", "w_b", "f_a", "f_b", F.col("dist").cast("int").alias("dist"))
        .orderBy("w_a", "w_b")
    )


@register(
    "text_heaps_law_fit",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t
      FROM documents WHERE text IS NOT NULL
    ), nd AS (
      SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
    ), firsts AS (
      SELECT t, min(doc_id) AS fd FROM tok GROUP BY t
    ), vd AS (
      SELECT fd AS doc_id, count(*) AS v FROM firsts GROUP BY fd
    ), curve AS (
      SELECT nd.doc_id,
             sum(nd.n) OVER w AS cum_n,
             sum(coalesce(vd.v, 0)) OVER w AS cum_v
      FROM nd LEFT JOIN vd USING (doc_id)
      WINDOW w AS (ORDER BY nd.doc_id)
    )
    SELECT (floor(regr_slope(ln(cum_v), ln(cum_n)) * 1000000.0 + 0.5)
            / 1000000.0) AS beta,
           (floor(exp(regr_intercept(ln(cum_v), ln(cum_n))) * 1000000.0 + 0.5)
            / 1000000.0) AS k,
           CAST(count(*) AS BIGINT) AS n_points
    FROM curve
    """,
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(N) ≈ K * N^beta, the
    companion diagnostic to the Zipf fit (natural text: beta ~ 0.4-0.6;
    templated/synthetic corpora flatten early). The growth curve is
    exact and fully distributed: per-doc token counts and per-doc NEW
    vocabulary (token -> min(doc_id) first occurrence, one aggregate)
    join on the doc grain, then BOTH cumulative series come from one
    carried_cumsum pass (range-partitioned prefix sums — no single-task
    window even though the curve is doc-grain, which at 100 TB is
    data-scale). OLS via the combinable regr_slope/regr_intercept."""
    from ..operators.scale import carried_cumsum

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    nd = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    vd = (
        tok.groupBy("t")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    grain = nd.join(vd, "doc_id", "left").select(
        "doc_id", "n", F.coalesce("v", F.lit(0)).alias("v")
    )
    curve = carried_cumsum(grain, "doc_id", ["n", "v"])
    return curve.agg(
        hround(F.regr_slope(F.log("cum_v"), F.log("cum_n")), 6).alias("beta"),
        hround(F.exp(F.regr_intercept(F.log("cum_v"), F.log("cum_n"))), 6).alias("k"),
        F.count(F.lit(1)).alias("n_points"),
    )
