"""Fourth LLM-data pack: corpus mixture planning (temperature
resampling) and PII scrubbing — the rebalancing and redaction steps of a
multilingual training-data pipeline.

Plan notes (100 TB posture):
- temperature resample: ONE data-sized aggregate (per-language counts);
  every later step is windows over the language domain (dozens of rows
  at any corpus size) — the mixture plan is metadata.
- pii scrub: pure regexp_replace projections inside whole-stage codegen;
  patterns are RE2-and-Java-compatible so the oracle runs them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..functions.rounding import hround
from .registry import register


@register(
    "corpus_temperature_resample",
    oracle="""
    WITH c AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), t AS (
      SELECT lang, n,
             n * 1.0 / sum(n) OVER () AS p,
             sum(n) OVER () AS total
      FROM c
    ), s AS (
      SELECT lang, n, p, total,
             pow(p, 0.7) / sum(pow(p, 0.7)) OVER () AS q
      FROM t
    )
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           (floor(p * 1000000.0 + 0.5) / 1000000.0) AS p_r,
           (floor(q * 1000000.0 + 0.5) / 1000000.0) AS q_r,
           (floor((q / p) * 1000000.0 + 0.5) / 1000000.0) AS rate_r,
           (floor(q * total * 10000.0 + 0.5) / 10000.0) AS expected_docs_r
    FROM s ORDER BY lang
    """,
)
def corpus_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual resampling plan (XLM-R style,
    alpha=0.7): per-language natural share p, adjusted sampling share
    q ∝ p^alpha, the relative up/down-sampling rate q/p, and the
    expected per-language doc count at unchanged corpus size. Low-
    resource languages are upsampled (rate > 1), high-resource ones
    downsampled — the mixture-scheduling step before hash-based
    sampling executes the plan (operators/sampling). All post-count math
    runs over the language domain: metadata-scale windows."""
    counts = (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = W.partitionBy()
    p = F.col("n_docs") / F.sum("n_docs").over(w)
    t = counts.select(
        "lang", "n_docs", p.alias("p"), F.sum("n_docs").over(w).alias("total")
    )
    q = F.pow("p", F.lit(0.7)) / F.sum(F.pow("p", F.lit(0.7))).over(w)
    s = t.select("lang", "n_docs", "p", "total", q.alias("q"))
    return s.select(
        "lang",
        "n_docs",
        hround(F.col("p"), 6).alias("p_r"),
        hround(F.col("q"), 6).alias("q_r"),
        hround(F.col("q") / F.col("p"), 6).alias("rate_r"),
        hround(F.col("q") * F.col("total"), 4).alias("expected_docs_r"),
    ).orderBy("lang")


_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
_URL = r"https?://[^\s]+"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             'reach user' || doc_id || ' at u' || doc_id ||
             '@mail' || (doc_id % 7) || '.example.org or 555-01' ||
             lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' via https://ex' || (doc_id % 5) || '.example/u/' || doc_id ||
             ' ' || text AS t
      FROM documents WHERE doc_id <= 300
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{_EMAIL}', '[EMAIL]', 'g'),
             '{_PHONE}', '[PHONE]', 'g'),
             '{_URL}', '[URL]', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_URL}')) AS INT) AS n_urls
    FROM raw ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data redaction): mask emails, US-style
    phone numbers, and URLs with typed placeholders and count each
    redaction class. Inputs are salted with deterministic synthetic PII
    built from doc_id so the masking is actually exercised on every row
    (the fixture corpus itself is clean). The patterns are written in
    the RE2-and-Java common subset, so Spark and DuckDB run the SAME
    regexes — pure codegen projections, no UDF."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 300)
    t = F.concat(
        F.lit("reach user"), F.col("doc_id").cast("string"),
        F.lit(" at u"), F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.org or 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" via https://ex"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example/u/"), F.col("doc_id").cast("string"),
        F.lit(" "), F.col("text"),
    )
    raw = docs.select("doc_id", t.alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL, "[EMAIL]"), _PHONE, "[PHONE]"
        ),
        _URL,
        "[URL]",
    )
    return raw.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all("t", F.lit(_URL), F.lit(0))).alias("n_urls"),
    ).orderBy("doc_id")
