"""Eleventh LLM-data pack (round 8): training-data LAYOUT operators —
what a pipeline does after curation, when the surviving corpus must be
laid out for the trainer:

- ``corpus_global_shuffle``: seeded deterministic global permutation.
  Trainers need documents globally shuffled, but a real global
  ``ORDER BY random()`` is a full sort with an unstable result; the
  production shape is a HASH permutation: shard = md5-bucket of the
  (seed, doc_id) key, position within shard = rank of the full md5 key.
  Appending new docs never moves existing ones between reruns of the
  same seed, and the within-shard window partitions by shard — at
  100 TB ``n_shards`` is chosen as corpus_size / target_shard_size
  (thousands of shards of 100-500 MB), so every window partition is one
  output shard and the sort stays partition-parallel; a low fixed
  shard count would serialize whole-corpus fractions into single tasks.
- ``corpus_shard_manifest``: the dataloader manifest for that layout —
  per-shard document / token / char totals (what a training job reads
  to plan epochs and weight shards) in ONE aggregate over the same
  hash assignment, no window needed.
- ``text_ngram_novelty``: per-document novelty — the fraction of a
  doc's distinct shingles whose FIRST corpus occurrence (lowest doc_id,
  the arrival-order convention) is this doc. The standard curation
  diagnostic for redundancy growth: novelty falling toward 0 as the
  corpus grows means new data is re-crawling what's already there.
  Shape: one shingle explode, min(doc_id) per shingle, one broadcast-
  friendly re-join keyed by shingle hash — never doc x doc pairs.

All pure column expressions — no UDFs, no driver loops; every query
carries a full DuckDB oracle (md5 arithmetic replays via
('0x' || substr(md5(k),1,7))::BIGINT exactly like sampling.hash_bucket).

Reference parity: none (no corpus layout in the reference — SURVEY.md
§2.12 gap surface; LLM-data operators from the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators.dedup import shingles
from ..operators.text import ws_tokens
from .registry import register

#: fixture-scale shard count. At 100 TB this is corpus_bytes /
#: target_shard_bytes (e.g. 100 TB / 256 MB ~ 400k shards), which is
#: what keeps each within-shard sort a single-task-sized unit of work.
SHUFFLE_SHARDS = 8
SHUFFLE_SEED = "shuffle:42:"


def _shuffle_key(id_col) -> F.Column:
    """Full md5 hex of the seeded id — the within-shard sort key
    (lexicographic hex compare is identical in Spark and DuckDB)."""
    return F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col(id_col).cast("string")))


def _shard_of(key: F.Column, n: int) -> F.Column:
    return F.conv(F.substring(key, 1, 7), 16, 10).cast("long") % F.lit(n)


_SHUFFLE_CTE = f"""
    WITH k AS (
      SELECT doc_id,
             md5('{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)) AS key
      FROM documents
    ), s AS (
      SELECT doc_id, key,
             ('0x' || substr(key, 1, 7))::BIGINT % {SHUFFLE_SHARDS} AS shard
      FROM k
    )
"""


@register(
    "corpus_global_shuffle",
    oracle=_SHUFFLE_CTE
    + """
    SELECT doc_id,
           CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
                AS INT) AS shard_pos
    FROM s
    ORDER BY shard, shard_pos
    """,
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle: (doc_id, shard, shard_pos).

    The permutation is pure column arithmetic (md5 of a seeded key), so
    the layout is reproducible across reruns and engines, stable under
    appends (existing docs keep their shard), and free of any global
    sort: the only window partitions BY SHARD, which at production
    shard counts is exactly one output file's worth of rows per
    partition. Ties on the 128-bit key are broken by doc_id (no ties at
    fixture scale, but the contract must be total for the hash-gate)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    key = _shuffle_key("doc_id")
    from pyspark.sql import Window

    shard = _shard_of(key, SHUFFLE_SHARDS)
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return (
        docs.select("doc_id", key.alias("key"), shard.alias("shard"))
        .withColumn("shard_pos", F.row_number().over(w))
        .select("doc_id", "shard", "shard_pos")
        .orderBy("shard", "shard_pos")
    )


@register(
    "corpus_shard_manifest",
    oracle=_SHUFFLE_CTE
    + """
    SELECT s.shard AS shard,
           count(*) AS n_docs,
           CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(length(d.text)) AS BIGINT) AS n_chars
    FROM s JOIN documents d ON d.doc_id = s.doc_id
    GROUP BY 1 ORDER BY 1
    """,
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataloader manifest for the hash-shuffle layout: per-shard doc /
    whitespace-token / char totals. ONE aggregate over the same shard
    assignment ``corpus_global_shuffle`` uses — the manifest a training
    job reads to plan epoch boundaries and shard weights. At 100 TB
    this is a map-side-combined groupBy on the shard key (n_shards
    groups — metadata-sized output), riding the same corpus scan that
    writes the shards."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    shard = _shard_of(_shuffle_key("doc_id"), SHUFFLE_SHARDS)
    return (
        docs.select(
            shard.alias("shard"),
            F.size(ws_tokens("text")).alias("toks"),
            F.length("text").alias("chars"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
            F.sum("chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("shard")
    )


@register(
    "text_ngram_novelty",
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
    ), first_occ AS (
      SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE f.first_doc = sh.doc_id) AS BIGINT)
             AS n_novel,
           (floor(count(*) FILTER (WHERE f.first_doc = sh.doc_id)
                  * 1.0 / count(*) * 1000000.0 + 0.5) / 1000000.0)
             AS novelty
    FROM sh JOIN first_occ f ON f.s = sh.s
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty under arrival order (doc_id): the
    share of a doc's distinct 3-gram shingles first seen in THIS doc
    (first occurrence = lowest doc_id owning the shingle). The curve of
    novelty over arrival order is the standard "is new data still new"
    curation diagnostic.

    Plan: one explode to (doc_id, shingle-hash), a min(doc_id) per
    shingle (the first-occurrence table — vocabulary-sized, md5-free:
    the 64-bit xxhash is only a grouping key, counts replay on shingle
    STRINGS in DuckDB), and one equi-join of the posting rows back to
    first occurrences keyed by the hash. Never doc x doc; both shuffles
    key on the shingle hash. Docs with zero shingles (< 3 tokens) have
    no rows here, matching the oracle's inner join."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(shingles("text", 3), lambda s: F.xxhash64(s))
            )
        ).alias("sh"),
    )
    first_occ = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first_occ, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "n_novel"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        hround(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
    ).orderBy("doc_id")
