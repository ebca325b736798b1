"""Second LLM-data pack: corpus reporting and training-set hygiene ops
over the ``documents`` / ``embeddings`` tables — bigram language stats,
distinctive-term extraction, C4-style quality filtering, language-balanced
sampling, train-vs-eval decontamination, embedding norm QA, and per-source
dedup-rate reporting.

Determinism contract (cross-engine hash gate): every ranking in this pack
orders by INTEGER quantities with total tie-breaks, so the row set is
bit-identical between Spark and DuckDB; floats appear only as output
cells (hround'd) never as sort keys.

Plan notes (100 TB posture):
- bigram/term stats: explode -> hash-agg; the shuffle carries (token,
  count) partial aggregates, never document text. Top-k via window over
  the already-aggregated (tiny) term domain or TakeOrderedAndProject.
- quality filter: pure scan-level Column predicates, one map-side pass,
  one tiny groupBy(source) agg.
- balanced sampling: one shuffle on lang; rank by content hash =
  reproducible under repartitioning and appends (same property as
  sampling.hash_split).
- decontamination: inverted-index semi-join on 64-bit shingle hashes;
  eval side distinct-shingles broadcasts (benchmarks are tiny vs the
  corpus) — never doc x doc.
- norm stats: per-row fold over a 64-float array (JVM, codegen), then a
  5-group agg — embeddings never shuffle, only (label, partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..functions.rounding import hround
from ..operators import dedup, text
from .registry import register


@register(
    "text_bigram_topk",
    oracle="""
    WITH bg AS (
      SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))
             AS bigram
      FROM documents
    )
    SELECT bigram, count(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams. Explode -> hash-agg (partial map-side
    combine does the heavy lifting); final top-k is
    TakeOrderedAndProject over the aggregated bigram domain, no global
    sort. Deterministic order: (count desc, bigram asc)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(text.bigrams("text")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "text_distinctive_terms_by_source",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT source, term, count(*) AS term_count
      FROM tok GROUP BY source, term
    ),
    df AS (
      SELECT term, count(DISTINCT source) AS doc_freq
      FROM tok GROUP BY term
    ),
    ranked AS (
      SELECT tf.source, tf.term, tf.term_count, df.doc_freq,
             CAST(row_number() OVER (PARTITION BY tf.source
                   ORDER BY tf.term_count DESC, df.doc_freq ASC, tf.term) AS INT) AS rank
      FROM tf JOIN df USING (term)
    )
    SELECT source, term, term_count, doc_freq, rank
    FROM ranked WHERE rank <= 3
    ORDER BY source, rank
    """,
)
def text_distinctive_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-shaped distinctive-term extraction with an integer-exact
    ranking: per source, the top-3 terms ordered by frequency with
    rarity (corpus doc_freq asc) then term as tie-breaks. Two aggs over
    the exploded tokens; the document-frequency table is term-domain-
    sized -> broadcasts; rank ordered by integers only so the row set is
    deterministic cross-engine — a float tf-idf score would ulp-flip
    ranks."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(text.ws_tokens("text")).alias("term"))
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("term_count"))
    df_ = tok.groupBy("term").agg(F.countDistinct("source").alias("doc_freq"))
    w = W.partitionBy("source").orderBy(
        F.desc("term_count"), F.asc("doc_freq"), F.asc("term")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("source", "term", "term_count", "doc_freq", "rank")
        .orderBy("source", "rank")
    )


@register(
    "corpus_quality_filter",
    oracle="""
    WITH f AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    ),
    flags AS (
      SELECT source,
             (n_tokens >= 20 AND n_tokens <= 1000
              AND n_distinct >= 0.2 * n_tokens) AS keep
      FROM f
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
    FROM flags GROUP BY source ORDER BY source
    """,
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule filter (length window + repetition ratio) reported
    per source. Pure scan-level Column predicates — one map-side pass,
    then a 20-group agg; at 100 TB the only shuffle carries 20 rows of
    partial counts."""
    docs = table(spark, sf_dir, "documents")
    toks = text.ws_tokens("text")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    keep = (
        (n_tokens >= 20)
        & (n_tokens <= 1000)
        & (n_distinct.cast("double") >= 0.2 * n_tokens.cast("double"))
    )
    return (
        docs.select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
        )
        .orderBy("source")
    )


@register(
    "sample_language_balanced",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY md5(text), doc_id) AS INT) AS rn
      FROM documents
    )
    SELECT doc_id, lang, rn FROM ranked
    WHERE rn <= 40
    ORDER BY lang, rn
    """,
)
def sample_language_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced subsample: at most 40 docs per language, chosen
    by content-hash rank — deterministic across engines, partitionings,
    and appends (same reproducibility contract as sampling.hash_split;
    a rand() sample would be none of those). One shuffle on lang; the
    per-group sort is bounded by the group, and rank<=40 truncates
    early."""
    docs = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5("text"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).cast("int").alias("rn"))
        .where(F.col("rn") <= 40)
        .orderBy("lang", "rn")
    )


@register(
    "decontaminate_train_vs_eval",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' ')) - 8 + 2),
             i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS s
      FROM documents
    ),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
    SELECT DISTINCT doc_id FROM sh
    WHERE doc_id % 50 <> 0 AND s IN (SELECT s FROM ev)
    ORDER BY doc_id
    """,
)
def decontaminate_train_vs_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set leakage check: train docs sharing any 8-token shingle
    with the eval slice (doc_id % 50 = 0 stands in for a benchmark
    set). Inverted-index semi-join on 64-bit shingle hashes; the eval
    side's distinct shingles broadcast. See operators/dedup.py
    decontaminate for the scale notes."""
    docs = table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 50 == 0)
    tr = docs.where(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(tr, ev, "text", "doc_id", k=8).orderBy("doc_id")


@register(
    "embedding_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
      FROM embeddings
    )
    SELECT label,
           count(*) AS n_vectors,
           (floor((min(l2)) * 10000.0 + 0.5) / 10000.0) AS min_norm,
           (floor((max(l2)) * 10000.0 + 0.5) / 10000.0) AS max_norm,
           (floor((avg(l2)) * 10000.0 + 0.5) / 10000.0) AS avg_norm
    FROM n GROUP BY label ORDER BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA: L2-norm distribution per label (catches unnormalized
    or degenerate vectors before ANN indexing). The fold runs per-row in
    codegen over the 64-float array — the shuffle carries only (label,
    partial min/max/sum), never the vectors. In-array fold order is
    fixed, so per-row norms are bit-identical cross-engine; min/max pick
    identical values and avg is hround'd."""
    emb = table(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", l2.alias("l2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            hround(F.min("l2"), 4).alias("min_norm"),
            hround(F.max("l2"), 4).alias("max_norm"),
            hround(F.avg("l2"), 4).alias("avg_norm"),
        )
        .orderBy("label")
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           count(*) - count(DISTINCT md5(text)) AS n_dup_rows
    FROM documents GROUP BY source ORDER BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-rate report per source — the summary a corpus-curation run
    emits before/after dedup. Shuffles 16-byte md5 hashes only (never
    text), one agg with a distinct-count."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_dup_rows"),
        )
        .orderBy("source")
    )
