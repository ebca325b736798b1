"""Seventh LLM-data pack: retrieval-grade text scoring and robust
fingerprinting.

- ``text_bm25_topk``: Okapi BM25 ranking of the corpus against a fixed
  term query — the retrieval scorer (data curation reuses it for
  query-targeted corpus selection). One corpus scan builds tf; df and
  avgdl derive from it; no per-term rescans.
- ``text_winnowing_fingerprints``: MOSS-style winnowing (Schleimer/
  Wilkerson/Aiken, SIGMOD'03): per window of w consecutive k-gram
  hashes keep the minimum (rightmost on ties) — guarantees any shared
  substring of length >= w+k-1 shares a fingerprint, with ~2/(w+1)
  selection density. The robust upgrade of the rolling-hash
  fingerprinter (text_fingerprint_rolling) for partial-overlap
  detection.

Reference parity: no counterpart (reference text surface = cleaning,
SURVEY.md §2.4); LLM-data gap operators from the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators import dedup, text as text_ops
from .registry import register

BM25_TERMS = ("spark", "window", "hash")
BM25_K1 = 1.2
BM25_B = 0.75

WIN_K = 3  # k-gram size (words)
WIN_W = 4  # winnowing window (k-gram hashes)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL
    ), dl AS (
      SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id
    ), avgdl AS (
      SELECT avg(dlen) AS avgdl, count(*) AS n_docs FROM dl
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM tok
      WHERE w IN ('spark', 'window', 'hash') GROUP BY doc_id, w
    ), df AS (
      SELECT w, count(*) AS df FROM tf GROUP BY w
    ), scored AS (
      SELECT tf.doc_id,
             sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * ({BM25_K1} + 1.0)
               / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dlen / avgdl))
             ) AS score
      FROM tf
      JOIN df USING (w)
      JOIN dl USING (doc_id)
      CROSS JOIN avgdl
      GROUP BY tf.doc_id
    )
    SELECT doc_id, (floor(score * 1000000.0 + 0.5) / 1000000.0) AS bm25
    FROM scored
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed 3-term query. Plan shape: ONE
    token-explode scan feeds everything — tf filters to the query terms
    BEFORE its groupBy (the explode stream shrinks by ~|vocab|/3
    immediately), df and avgdl are tiny aggregates of tf/dl, both
    broadcast; the final ranking is TakeOrderedAndProject, never a
    global sort. At 100 TB the doc-length table is the only corpus-sized
    aggregate, and it's the same single exchange the quality-score
    queries already pay."""
    tok = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    avgdl = dl.agg(
        F.avg("dlen").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        tok.where(F.col("w").isin(*BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dlen") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1.0) / denom).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .select("doc_id", hround("score", 6).alias("bm25"))
    )


# winnowing as a reusable oracle CTE: tok -> 3-grams -> 40-bit hashes with
# the rightmost-tie-break key -> window minima -> distinct fingerprints
_WINNOW_CTE = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents WHERE doc_id < 150 AND text IS NOT NULL
    ), grams AS (
      SELECT doc_id, pos - 1 AS gpos,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS g
      FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ), hashes AS (
      SELECT doc_id, gpos,
             ('0x' || substr(md5(g), 1, 10))::BIGINT * 1048576
               + (1048575 - gpos) AS hkey
      FROM grams WHERE g IS NOT NULL
    ), mins AS (
      SELECT doc_id,
             min(hkey) OVER (PARTITION BY doc_id ORDER BY gpos
                             ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS sel,
             count(*) OVER (PARTITION BY doc_id ORDER BY gpos
                            ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS wsize
      FROM hashes
    ), fp AS (
      SELECT DISTINCT doc_id,
             CAST(sel // 1048576 AS BIGINT) AS fp_hash,
             CAST(1048575 - (sel % 1048576) AS INT) AS fp_pos
      FROM mins WHERE wsize = {WIN_W}
    )
"""


@register(
    "text_winnowing_fingerprints",
    oracle=_WINNOW_CTE
    + """
    SELECT doc_id, fp_hash, fp_pos FROM fp ORDER BY doc_id, fp_pos
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints: hash every {WIN_K}-word gram (40-bit
    md5 prefix — engine-portable), slide a {WIN_W}-hash window, keep
    each window's minimum hash with RIGHTMOST-position tie-break, then
    distinct per document. The tie-break and the min ride in ONE 60-bit
    key (hash * 2^20 + (2^20-1-pos)): minimizing it minimizes the hash
    and, among equal hashes, maximizes the position — so the window min
    is a plain ``min`` over a ROWS frame, no argmin gymnastics, and
    both engines compute the identical integer. Windows are per-doc
    ROWS frames (partition-parallel, no global order); density is
    ~2/(w+1) of grams, the paper's guarantee that any shared run of
    >= w+k-1 words leaves a shared fingerprint."""
    docs = table(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 150) & F.col("text").isNotNull()
    )
    return text_ops.winnowing_fingerprints(docs, k=WIN_K, w=WIN_W).orderBy(
        "doc_id", "fp_pos"
    )


@register(
    "dedup_substring_spans",
    # full corpus: the span detector's own frequency cap bounds the work,
    # so unlike the raw fingerprint listing it needs no doc_id cap
    oracle=_WINNOW_CTE.replace("doc_id < 150 AND ", "", 1)
    + """
    , freq AS (
      SELECT fp_hash FROM fp GROUP BY fp_hash HAVING count(DISTINCT doc_id) <= 50
    ), m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fp_pos AS pa, b.fp_pos AS pb
      FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
      WHERE a.fp_hash IN (SELECT fp_hash FROM freq)
    ), d AS (
      SELECT id_a, id_b, pa - pb AS diag, count(*) AS n_aligned,
             min(pa) AS start_a, max(pa) - min(pa) + 3 AS span_words
      FROM m GROUP BY id_a, id_b, pa - pb
      HAVING count(*) >= 2
    )
    SELECT id_a, id_b, CAST(diag AS INT) AS diag,
           CAST(n_aligned AS BIGINT) AS n_aligned,
           CAST(start_a AS INT) AS start_a, CAST(span_words AS INT) AS span_words
    FROM d
    QUALIFY row_number() OVER (PARTITION BY id_a, id_b
                               ORDER BY n_aligned DESC, diag) = 1
    ORDER BY id_a, id_b
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-substring span detection (the Lee et al. 2022
    exact-substring-dedup signal, distributed): matching winnowing
    fingerprints aligned on one diagonal (fp_pos_a - fp_pos_b constant)
    witness a contiguous shared word run; per pair, report the best
    diagonal with its aligned count, start offset, and spanned word
    length. The oracle replays the identical fingerprint join +
    diagonal grouping brute-force; operators/dedup.
    aligned_fingerprint_spans documents the 100 TB plan shape
    (equi-join on fp_hash, frequency-capped postings, no BNLJ)."""
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    fp = text_ops.winnowing_fingerprints(docs, k=WIN_K, w=WIN_W)
    return dedup.aligned_fingerprint_spans(
        fp, k=WIN_K, min_aligned=2, max_fp_freq=50
    ).orderBy("id_a", "id_b")


TOKEN_BUDGET = 6000
MIX_BUCKETS = 10000


@register(
    "corpus_mixture_plan",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ), per_source AS (
      SELECT source, sum(n_tokens) AS src_tokens, count(*) AS n_docs
      FROM per_doc GROUP BY source
    ), plan AS (
      SELECT source, src_tokens, n_docs,
             least(1.0, CAST({TOKEN_BUDGET} AS DOUBLE)
                        / (SELECT count(*) FROM per_source) / src_tokens) AS rate
      FROM per_source
    ), sampled AS (
      SELECT d.source,
             sum(CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
                           % {MIX_BUCKETS} < p.rate * {MIX_BUCKETS}
                      THEN d.n_tokens ELSE 0 END) AS sampled_tokens,
             sum(CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
                           % {MIX_BUCKETS} < p.rate * {MIX_BUCKETS}
                      THEN 1 ELSE 0 END) AS sampled_docs
      FROM per_doc d JOIN plan p USING (source)
      GROUP BY d.source
    )
    SELECT p.source,
           CAST(p.src_tokens AS BIGINT) AS src_tokens,
           (floor(p.rate * 1000000.0 + 0.5) / 1000000.0) AS rate,
           CAST(s.sampled_tokens AS BIGINT) AS sampled_tokens,
           CAST(s.sampled_docs AS BIGINT) AS sampled_docs
    FROM plan p JOIN sampled s USING (source)
    ORDER BY p.source
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning — the data-mixing step of a
    pretraining pipeline: target an equal token share per source under a
    total budget, derive each source's sampling rate
    (min(1, budget/n_sources/source_tokens)), apply it as a
    DETERMINISTIC md5-bucket filter on doc_id (reproducible across
    runs/engines/partitionings, unlike rand()), and report planned rate
    vs achieved tokens/docs per source.

    Plan shape: one corpus scan builds (doc, source, n_tokens); the
    per-source plan is a tiny aggregate joined back BROADCAST (sources
    number in the hundreds at web scale, the fact side never
    reshuffles); the sampled accounting rides the same scan — two
    exchanges total. The rate column is also exactly what a writer would
    use to emit the mixed corpus itself (sample_hash_split applies the
    identical bucket filter)."""
    per_doc = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )
    per_source = per_doc.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens"), F.count(F.lit(1)).alias("n_docs")
    )
    n_sources = per_source.select(F.count(F.lit(1)).alias("n_sources"))
    plan = per_source.crossJoin(F.broadcast(n_sources)).select(
        "source",
        "src_tokens",
        F.least(
            F.lit(1.0),
            F.lit(float(TOKEN_BUDGET)) / F.col("n_sources") / F.col("src_tokens"),
        ).alias("rate"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % MIX_BUCKETS
    )
    keep = bucket < F.col("rate") * MIX_BUCKETS
    sampled = (
        per_doc.join(F.broadcast(plan), "source")
        .groupBy("source")
        .agg(
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(0)).alias("sampled_tokens"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("sampled_docs"),
        )
    )
    return (
        plan.join(sampled, "source")
        .select(
            "source",
            F.col("src_tokens").cast("long").alias("src_tokens"),
            hround("rate", 6).alias("rate"),
            F.col("sampled_tokens").cast("long").alias("sampled_tokens"),
            F.col("sampled_docs").cast("long").alias("sampled_docs"),
        )
        .orderBy("source")
    )
