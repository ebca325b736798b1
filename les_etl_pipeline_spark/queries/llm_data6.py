"""Sixth LLM-data pack: sub-document dedup, corpus balancing caps, and
the BPE apply side.

- ``dedup_chunk_reconstruct``: chunk-level (line-level-style) exact
  dedup with document reconstruction — the CCNet/RefinedWeb move that
  strips boilerplate chunks shared across documents while keeping the
  unique remainder of every document.
- ``corpus_source_cap``: per-source document caps (the per-domain cap
  every web-crawl pipeline applies so one giant domain can't dominate
  the training mix), deterministic keep-order.
- ``text_bpe_encode``: tokenize the corpus with merges trained by
  ``text_bpe_train_merges`` (operators/text.bpe_encode) — oracle-paired
  since r7 via the unrolled delimited-string merge chain
  (queries/_bpe_oracle.py); exactness vs a pure-Python reference
  encoder is additionally pinned in tests/test_round5_ops.py.

Reference parity: no counterpart in the reference ETL (its text surface
stops at cleaning, SURVEY.md §2.4); these are LLM-data-pipeline gap
operators from the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import text as text_ops
from . import _bpe_oracle
from .registry import register

CHUNK_TOKENS = 8
SOURCE_CAP = 15


@register(
    "dedup_chunk_reconstruct",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE text IS NOT NULL AND text <> ''
    ), tok AS (
      SELECT doc_id,
             unnest(toks) AS w,
             unnest(generate_series(1, len(toks))) AS pos
      FROM t
    ), ch AS (
      SELECT doc_id,
             CAST((pos - 1) // {CHUNK_TOKENS} AS BIGINT) AS chunk_idx,
             string_agg(w, ' ' ORDER BY pos) AS chunk
      FROM tok GROUP BY doc_id, chunk_idx
    ), ranked AS (
      SELECT doc_id, chunk_idx, chunk,
             row_number() OVER (PARTITION BY chunk
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM ch
    ), kept AS (
      SELECT doc_id,
             string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text,
             count(*) AS n_kept
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, count(*) AS n_total FROM ch GROUP BY doc_id
    )
    SELECT totals.doc_id,
           coalesce(kept.clean_text, '') AS clean_text,
           CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(totals.n_total AS BIGINT) AS n_total
    FROM totals LEFT JOIN kept USING (doc_id)
    ORDER BY doc_id
    """,
)
def dedup_chunk_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup with document reconstruction: split every
    document into {CHUNK_TOKENS}-token chunks, keep only the globally
    FIRST occurrence of each chunk text (ordered by doc_id, chunk_idx —
    deterministic), and stitch each document back together from its
    surviving chunks. Documents made entirely of boilerplate survive as
    empty rows, so the yield accounting (n_kept / n_total) is complete.

    The sub-document twin of exact document dedup: catches shared
    headers/footers/navigation that document-level hashing never sees.
    Plan shape: one explode -> chunk groupBy, one window over the CHUNK
    key (partitioned by chunk content — no global order), one
    reassembly groupBy. Chunk text never shuffles twice: the dedup
    window partitions by the chunk string itself, and reassembly ships
    only surviving chunks. At 100 TB swap the chunk string for its
    xxhash64 in the window key to shrink the dedup shuffle to 8 bytes/
    chunk — kept as text here so the oracle can replay byte-for-byte.
    """
    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    )
    ch = (
        toks.withColumn("chunk_idx", (F.col("pos0") / CHUNK_TOKENS).cast("long"))
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos0", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("chunk")
        )
    )
    rn = F.row_number().over(W.partitionBy("chunk").orderBy("doc_id", "chunk_idx"))
    ranked = ch.withColumn("rn", rn)
    # ONE reassembly pass over the ranked chunks: collect_list drops the
    # NULLs the rn > 1 condition produces, so the surviving-chunk stitch,
    # n_kept and n_total are all aggregates of the SAME groupBy — the old
    # totals/kept split read the corpus-scale chunk table twice and
    # joined the halves back (r14, guide §2.4/§2.1: one fewer corpus
    # explode+shuffle, one fewer join). A doc made entirely of
    # boilerplate collects an empty array -> clean_text '' and n_kept 0,
    # the exact contract the old LEFT JOIN + coalesce encoded.
    keep = F.when(F.col("rn") == 1, F.struct("chunk_idx", "chunk"))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(keep)), lambda s: s["chunk"]
                ),
            ).alias("clean_text"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "doc_id",
            "clean_text",
            F.col("n_kept").cast("long").alias("n_kept"),
            F.col("n_total").cast("long").alias("n_total"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_source_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk AS INT) AS source_rank
    FROM ranked WHERE rk <= {SOURCE_CAP}
    ORDER BY source, source_rank
    """,
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the per-domain cap of web-corpus
    curation: keep at most {SOURCE_CAP} documents per source,
    preferring longer documents (n_chars desc) with doc_id as the
    deterministic tie-break. One window partitioned by source — no
    global order, no shuffle beyond the source key; a skewed giant
    source costs one partition's top-k, and at 100 TB the same query
    runs with the window replaced by a per-source TakeOrderedAndProject
    if a single source outgrows a task (the salting lever in
    operators/scale.py applies unchanged)."""
    docs = table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    )
    return (
        docs.select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
        .withColumn("source_rank", rk.cast("int"))
        .where(F.col("source_rank") <= SOURCE_CAP)
        .orderBy("source", "source_rank")
    )


@register(
    "text_bpe_encode",
    oracle=_bpe_oracle.bpe_encode_oracle(
        8, "text IS NOT NULL", "text IS NOT NULL AND doc_id < 300"
    ),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply side of BPE: train 8 merges on the corpus, then encode a
    deterministic slice of it (operators/text.bpe_encode). Merge folds
    run on the distinct WORD VOCABULARY only; the corpus pass is one
    word->tokens join plus an ordered per-document flatten. Output
    includes a stable preview of the first tokens so the rows carry
    checkable content. Oracle-paired since r7 (VERDICT r6 #7): train
    AND encode replay in DuckDB via the unrolled delimited-string
    merge chain (queries/_bpe_oracle.py); exactness vs a pure-Python
    BPE reference is additionally pinned in tests/test_round5_ops.py."""
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    merges = text_ops.bpe_train_merges(docs, n_merges=8)
    enc = text_ops.bpe_encode(docs.where(F.col("doc_id") < 300), merges)
    return enc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.concat_ws("|", F.slice("tokens", 1, 12)).alias("token_preview"),
    ).orderBy("doc_id")
