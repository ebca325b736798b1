"""Fifth LLM-data pack: corpus-level language-model scoring and the
raw-Arrow multimodal chunking twin.

- ``text_unigram_logprob``: per-document mean unigram log-probability
  under the corpus's own empirical unigram model — the classic cheap
  perplexity proxy for pretraining quality filtering (low mean logprob
  = rare-token soup / noise; suspiciously high = boilerplate).
- ``multimodal_arrow_chunks``: byte-window chunking via mapInArrow
  (operators/multimodal.arrow_byte_chunks) — pinned to the exact same
  output as the mapInPandas path so the two Python-side batch APIs are
  verified interchangeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from . import _bpe_oracle, _pq_oracle
from .registry import register


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tc AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL)
      GROUP BY doc_id, tok
    ), v AS (
      SELECT tok, sum(c) AS n_tok FROM tc GROUP BY tok
    ), tot AS (
      SELECT sum(n_tok) AS n_total FROM v
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           (floor((sum(c * ln(n_tok / n_total)) / sum(c)) * 1000000.0 + 0.5)
            / 1000000.0) AS mean_logprob
    FROM tc JOIN v USING (tok) CROSS JOIN tot
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    empirical unigram LM — the cheap perplexity proxy used for
    pretraining quality filters.

    ONE corpus scan: the (doc, token, count) table is built once and
    localCheckpointed, then reused for the vocab rollup, the corpus
    total, and the per-doc scoring join — without the checkpoint
    Catalyst re-derives each use from the raw text (a naive formulation
    here planned THREE corpus scans; at 100 TB that is the whole cost).
    The per-doc mean is the count-weighted form sum(c*ln p)/sum(c) —
    algebraically the instance-level mean, computed on the much smaller
    (doc, token) table. The corpus total is a 1-row broadcast, never a
    driver collect; the token->vocab join is left to AQE (zipf skew on
    the key is what AQE's skew-join handles). hround(6) absorbs
    cross-engine float-sum ordering."""
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    vocab = tc.groupBy("tok").agg(F.sum("c").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("n_total"))
    return (
        tc.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            hround(
                F.sum(F.col("c") * F.ln(F.col("n_tok") / F.col("n_total")))
                / F.sum("c"),
                6,
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_arrow_chunks",
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
      FROM documents WHERE doc_id <= 50
    )
    SELECT doc_id,
           CAST(k AS INT) AS chunk_idx,
           CAST(k * 64 AS BIGINT) AS "offset",
           CAST(least(64, nb - k * 64) AS INT) AS n_bytes,
           lower(substring(hx, k * 128 + 1, 128)) AS chunk_hex
    FROM h CROSS JOIN (SELECT unnest(generate_series(0, 4095)) AS k) t
    WHERE k * 64 < nb
    ORDER BY doc_id, chunk_idx
    """,
)
def multimodal_arrow_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-window chunking through mapInArrow (raw pyarrow
    RecordBatches, no pandas conversion) — same semantics, oracle, and
    output contract as multimodal_byte_chunks, so the two Python batch
    APIs are provably interchangeable; the Arrow path skips the pandas
    object-dtype boxing of binary cells, the cheapest Python-side route
    for byte slicing."""
    from ..operators import multimodal

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    chunks = multimodal.arrow_byte_chunks(
        multimodal.to_asset_table(docs), chunk_size=64
    )
    return chunks.orderBy("doc_id", "chunk_idx")


@register(
    "similarity_pq_topk",
    oracle=_pq_oracle.pq_topk_oracle(
        dim=64, m=8, n_codes=16, k=5, rerank=50, query_sql="vec_id < 8"
    ),
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.pq_topk): vectors
    compress to m=8 sub-space code ids against k-means codebooks;
    queries score candidates with m table lookups (ADC), never a
    full-vector dot product; the ADC short-list is then re-scored with
    exact cosine (rerank=50 vectors per query, ~10% of this corpus).
    The memory-bandwidth scale path that composes with IVF into IVF-PQ.
    Oracle-paired since r7: the deterministic Lloyd codebooks
    (similarity.lloyd_codebooks) replay bit-exactly in DuckDB — seed
    codebooks, one 6dp-mean update, encode, ADC with DECIMAL-exact
    sums, exact cosine re-rank (queries/_pq_oracle.py). Recall vs brute
    force additionally bounded in tests/test_similarity_pq.py."""
    from ..operators.similarity import pq_topk

    emb = table(spark, sf_dir, "embeddings")
    return pq_topk(
        emb, F.col("vec_id") < 8, k=5, m=8, n_codes=16, rerank=50
    ).orderBy("query_id", "rank")


@register(
    "text_bpe_train_merges",
    oracle=_bpe_oracle.bpe_train_oracle(6, "doc_id <= 200"),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/text.bpe_train_merges):
    one corpus pass builds the weighted word vocabulary, then each merge
    iteration runs on vocab-sized data only (adjacent-pair explode →
    groupBy → arg-max; the driver sees ONE row per iteration — the
    winning pair is a model parameter). Oracle-paired since r7: the
    training loop unrolls into 6 DuckDB CTE stages where the greedy
    merge fold replays as a delimited-string replace (VERDICT r6 #7;
    see queries/_bpe_oracle.py). Exactness vs a pure-Python reference
    BPE is additionally pinned in tests/test_round5_ops.py."""
    from ..operators.text import bpe_train_merges

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    merges = bpe_train_merges(docs, n_merges=6)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "merge_rank int, left string, right string, pair_count long",
    ).orderBy("merge_rank")


@register(
    "similarity_ivf_pq_topk",
    oracle=_pq_oracle.ivf_pq_topk_oracle(
        dim=64, n_cells=8, n_probe=4, m=8, n_codes=16, k=5, rerank=50,
        query_sql="vec_id < 8",
    ),
)
def similarity_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (operators/similarity.ivf_pq_topk): k-means
    cells bound WHICH vectors a query touches (n_probe/n_cells of the
    corpus), product quantization bounds the BYTES per touched vector
    (m codes + ADC table lookups), and the exact re-rank of the
    short-list restores rank quality — the production vector-index
    layout. Oracle-paired since r7 (deterministic Lloyd at BOTH levels:
    coarse cells + subspace codebooks; queries/_pq_oracle.py). Recall
    bounds in tests/test_similarity_pq.py."""
    from ..operators.similarity import ivf_pq_topk

    emb = table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(
        emb, F.col("vec_id") < 8, k=5, n_cells=8, n_probe=4, m=8, n_codes=16, rerank=50
    ).orderBy("query_id", "rank")


@register(
    "corpus_clean_pipeline",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split(text,' ')) AS INT) AS n_toks,
             len(list_distinct(string_split(text,' '))) * 1.0
               / len(string_split(text,' ')) AS distinct_ratio,
             CAST(len(list_filter(string_split(text,' '),
                  x -> list_contains(['the','a','of','and','to','in','is'], x))) AS INT) AS en,
             CAST(len(list_filter(string_split(text,' '),
                  x -> list_contains(['el','la','de','y','que','en','un'], x))) AS INT) AS es,
             CAST(len(list_filter(string_split(text,' '),
                  x -> list_contains(['le','la','de','et','que','en','un'], x))) AS INT) AS fr,
             CAST(len(list_filter(string_split(text,' '),
                  x -> list_contains(['der','die','das','und','zu','in','ist'], x))) AS INT) AS de
      FROM documents WHERE text IS NOT NULL
    ), langed AS (
      SELECT *,
             CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                  WHEN en = greatest(en, es, fr, de) THEN 'en'
                  WHEN es = greatest(en, es, fr, de) THEN 'es'
                  WHEN fr = greatest(en, es, fr, de) THEN 'fr'
                  ELSE 'de' END AS predicted_lang,
             (len(string_split(text,' ')) >= 20 AND
              len(list_distinct(string_split(text,' '))) * 1.0
                / len(string_split(text,' ')) >= 0.3) AS kept
      FROM s JOIN documents USING (doc_id)
    )
    SELECT predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
           (floor((count(*) FILTER (kept)) * 1.0 / count(*) * 10000.0 + 0.5)
            / 10000.0) AS kept_frac,
           (floor(avg(n_toks) FILTER (kept) * 100.0 + 0.5) / 100.0)
             AS avg_kept_tokens
    FROM langed GROUP BY predicted_lang ORDER BY predicted_lang
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning report — the composition the pieces
    exist for: language-ID (stopword heuristic), per-doc quality
    features (token count, type-token ratio), a keep/drop gate, and the
    per-language yield report a data curator reads before a pretraining
    run. Everything is one projection + one groupBy (no joins, no UDFs)
    — at 100 TB this is a single corpus scan with map-side combine,
    which is the point of keeping quality signals as column
    expressions."""
    from ..operators import text as T

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = T.ws_tokens("text")
    n_toks = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n_toks
    kept = (n_toks >= 20) & (distinct_ratio >= 0.3)
    staged = docs.select(
        T.predicted_lang(toks).alias("predicted_lang"),
        n_toks.alias("n_toks"),
        kept.alias("kept"),
    )
    return (
        staged.groupBy("predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("kept")).alias("n_kept"),
            hround(F.count_if(F.col("kept")) / F.count(F.lit(1)), 4).alias(
                "kept_frac"
            ),
            hround(F.avg(F.when(F.col("kept"), F.col("n_toks")))).alias(
                "avg_kept_tokens"
            ),
        )
        .orderBy("predicted_lang")
    )


PPL_RATES = {1: 0.5, 2: 1.0, 3: 0.8, 4: 0.2}


@register(
    "corpus_ppl_bucket_sampling",
    oracle="""
    WITH tc AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL)
      GROUP BY doc_id, tok
    ), v AS (
      SELECT tok, sum(c) AS n_tok FROM tc GROUP BY tok
    ), tot AS (
      SELECT sum(n_tok) AS n_total FROM v
    ), lp AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             (floor((sum(c * ln(n_tok / n_total)) / sum(c)) * 1000000.0 + 0.5)
              / 1000000.0) AS mlp
      FROM tc JOIN v USING (tok) CROSS JOIN tot GROUP BY doc_id
    ), q AS (
      SELECT doc_id, n_tokens, mlp,
             ntile(4) OVER (ORDER BY mlp DESC, doc_id) AS bucket
      FROM lp
    ), planned AS (
      SELECT *, CAST(CASE bucket WHEN 1 THEN 0.5 WHEN 2 THEN 1.0
                                 WHEN 3 THEN 0.8 ELSE 0.2 END AS DOUBLE) AS rate,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000
               AS hb
      FROM q
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, rate,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN hb < rate * 10000 THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_docs,
           CAST(sum(CASE WHEN hb < rate * 10000 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM planned GROUP BY bucket, rate ORDER BY bucket
    """,
)
def corpus_ppl_bucket_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity-bucketed sampling plan: score every doc
    with the unigram-LM proxy (same checkpointed one-scan pipeline as
    text_unigram_logprob), quartile it (ntile over the 6dp-ROUNDED score
    — rounding BEFORE the ordering is what makes the bucket assignment
    engine-portable, raw float sums would flip ties), downweight the
    most-predictable head (boilerplate, rate .5) and the noise tail
    (rate .2), keep the middle, and apply the rates with the
    deterministic md5-bucket filter shared with corpus_mixture_plan.
    Reports planned rate vs achieved docs/tokens per bucket. The
    quartile is scale.exact_ntile (range-partitioned parallel rank) —
    exact ntile(4) semantics with no single-task global sort even at
    extreme doc counts."""
    from ..operators.scale import exact_ntile

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    vocab = tc.groupBy("tok").agg(F.sum("c").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("n_total"))
    lp = (
        tc.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            hround(
                F.sum(F.col("c") * F.log(F.col("n_tok") / F.col("n_total")))
                / F.sum("c"),
                6,
            ).alias("mlp"),
        )
    )
    binned = exact_ntile(lp, [F.col("mlp").desc(), "doc_id"], 4)
    expr = None
    for b, r in PPL_RATES.items():
        expr = F.when(F.col("bucket") == b, F.lit(r)) if expr is None else expr.when(
            F.col("bucket") == b, F.lit(r)
        )
    hb = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 10000
    )
    keep = F.col("hb") < F.col("rate") * 10000
    return (
        binned.select("doc_id", "n_tokens", "bucket", expr.alias("rate"), hb.alias("hb"))
        .groupBy("bucket", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("long")).alias("kept_docs"),
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(0)).alias("kept_tokens"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "rate", "n_docs", "kept_docs", "kept_tokens",
        )
        .orderBy("bucket")
    )


@register(
    "text_bigram_logprob",
    oracle="""
    WITH bg AS (
      SELECT doc_id, b, count(*) AS c
      FROM (
        SELECT doc_id,
               w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
              FROM documents WHERE text IS NOT NULL)
      ) WHERE b IS NOT NULL GROUP BY doc_id, b
    ), v AS (
      SELECT b, sum(c) AS n_b FROM bg GROUP BY b
    ), pref AS (
      SELECT string_split(b, ' ')[1] AS w1, sum(n_b) AS n_w1 FROM v GROUP BY 1
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           (floor((sum(c * ln(n_b / n_w1)) / sum(c)) * 1000000.0 + 0.5)
            / 1000000.0) AS mean_logprob
    FROM bg JOIN v USING (b)
    JOIN pref ON string_split(b, ' ')[1] = pref.w1
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean BIGRAM log-probability per document under the corpus's own
    bigram LM (p(w2|w1) = c(w1 w2) / c(w1 *)) — one conditioning order
    above text_unigram_logprob, the step from 'rare tokens' to 'unlikely
    transitions' (catches shuffled/boilerplate text a unigram model
    scores as normal). Same plan discipline: ONE (doc, bigram, count)
    checkpoint feeds the bigram vocab, the prefix totals, and the
    scoring join; no second corpus scan."""
    from ..operators import text as text_ops

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    bg = (
        docs.select("doc_id", F.explode(text_ops.bigrams("text")).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    v = bg.groupBy("b").agg(F.sum("c").alias("n_b"))
    pref = (
        v.groupBy(F.split("b", " ")[0].alias("w1")).agg(F.sum("n_b").alias("n_w1"))
    )
    return (
        bg.join(v, "b")
        .join(pref, F.split(F.col("b"), " ")[0] == F.col("w1"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            hround(
                F.sum(F.col("c") * F.log(F.col("n_b") / F.col("n_w1"))) / F.sum("c"), 6
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_bigram_logprob_interp",
    oracle=r"""
    WITH tok AS MATERIALIZED (
      SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
      FROM documents WHERE text IS NOT NULL
    ), uni AS MATERIALIZED (
      SELECT w, count(*) AS cw FROM tok GROUP BY w
    ), tot AS MATERIALIZED (
      SELECT sum(cw) AS n FROM uni
    ), wsr AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws
      FROM documents WHERE text IS NOT NULL
    ), idx AS (
      SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
      FROM wsr WHERE len(ws) >= 2
    ), pairs AS MATERIALIZED (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, count(*) AS c
      FROM idx GROUP BY 1, 2, 3
    ), bg AS MATERIALIZED (
      SELECT w1, w2, sum(c) AS nbg FROM pairs GROUP BY 1, 2
    ), ctx AS MATERIALIZED (
      SELECT w1, sum(nbg) AS nctx FROM bg GROUP BY 1
    )
    SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_bigrams,
           (floor((sum(p.c * ln(0.75 * (CAST(bg.nbg AS DOUBLE)
                                        / CAST(ctx.nctx AS DOUBLE))
                                 + 0.25 * (CAST(uni.cw AS DOUBLE)
                                           / CAST(tot.n AS DOUBLE))))
                   / sum(p.c)) * 1000000.0 + 0.5) / 1000000.0)
               AS mean_logprob
    FROM pairs p
    JOIN bg USING (w1, w2)
    JOIN ctx USING (w1)
    JOIN uni ON uni.w = p.w2
    CROSS JOIN tot
    GROUP BY p.doc_id
    """,
)
def text_bigram_logprob_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean INTERPOLATED bigram log-probability per document under the
    corpus's own empirical bigram LM — the KenLM-style perplexity filter
    one order up from ``text_unigram_logprob``:
    p(w2|w1) = 0.75 * c(w1 w2)/c(w1 .) + 0.25 * c(w2)/N (Jelinek-Mercer
    interpolation; the unigram back-off keeps every observed bigram's
    probability strictly positive without discount bookkeeping).

    Scale shape: TWO corpus scans (token grain for the unigram model,
    bigram grain for everything else) and no more — the (doc, bigram,
    count) table is built once, lazily checkpointed, and reused for the
    bigram model, the context totals, and the per-doc scoring join;
    the corpus token total is a 1-row broadcast. Model joins key on the
    bigram/context/token — zipf skew on those keys is AQE skew-join
    territory, same doctrine as the unigram query. Per-doc mean is the
    count-weighted form on the (doc, bigram) grain; hround(6) absorbs
    cross-engine float-sum ordering (the per-term arithmetic is
    written in the same operation order in both engines)."""
    from ..operators import text as text_ops

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    uni = (
        docs.select(F.explode(text_ops.ws_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    tot = uni.agg(F.sum("cw").alias("n"))
    pairs = (
        docs.select("doc_id", F.explode(text_ops.bigrams("text")).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    bg = pairs.groupBy("g").agg(F.sum("c").alias("nbg"))
    ctx = (
        bg.withColumn("w1", F.split("g", " ").getItem(0))
        .groupBy("w1")
        .agg(F.sum("nbg").alias("nctx"))
    )
    p_interp = F.lit(0.75) * (
        F.col("nbg").cast("double") / F.col("nctx").cast("double")
    ) + F.lit(0.25) * (F.col("cw").cast("double") / F.col("n").cast("double"))
    return (
        pairs.join(bg, "g")
        .withColumn("w1", F.split("g", " ").getItem(0))
        .withColumn("w2", F.split("g", " ").getItem(1))
        .join(ctx, "w1")
        .join(uni.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            hround(
                F.sum(F.col("c") * F.log(p_interp)) / F.sum("c"), 6
            ).alias("mean_logprob"),
        )
    )
