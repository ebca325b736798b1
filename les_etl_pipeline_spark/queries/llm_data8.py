"""Eighth LLM-data pack: deterministic clustering, lossless SimHash
banding, and EWMA time-series smoothing.

- ``embedding_kmeans_lloyd``: two Lloyd iterations from deterministic
  seeds (k lowest vec_ids) — the corpus-bucketing step behind mixture
  curation and semantic-dedup tiers, oracle-paired because every
  distance/centroid is an engine-portable rounded fold
  (operators/clustering.py).
- ``dedup_simhash_hamming``: near-dup pairs at Hamming <= 3 via 4x16-bit
  signature banding. The pigeonhole argument makes the candidate filter
  LOSSLESS (hamming <= n_bands - 1 => at least one band agrees), so the
  banded plan is checked against a brute-force all-pairs oracle —
  the exactness story MinHash LSH cannot offer.
- ``events_ewma_daily``: per-user exponentially weighted moving average
  of daily event counts (alpha = 0.3). Spark folds each user's ordered
  day array sequentially (deterministic arithmetic order); the oracle
  runs the IDENTICAL recurrence one step at a time in a recursive CTE —
  same FP ops, bit-identical results. Per-user state is bounded by the
  timeline length (days), the same split ``pack_training_sequences``
  uses; no global window anywhere.

Reference parity: none (no clustering/similarity/time-series in the
reference — SURVEY.md §2.5/§2.12 gap surface; LLM-data operators from
the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators import clustering, dedup, text as text_ops
from .registry import register

EWMA_ALPHA = 0.3


@register(
    "embedding_kmeans_lloyd",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, v AS c
      FROM e ORDER BY vec_id LIMIT 8
    ), d1 AS (
      SELECT e.vec_id, e.v, s.cluster,
             (floor(list_aggregate(list_transform(range(1, 65),
                j -> (e.v[j] - s.c[j]) * (e.v[j] - s.c[j])), 'sum')
                * 1000000.0 + 0.5) / 1000000.0) AS d
      FROM e CROSS JOIN seeds s
    ), a1 AS (
      SELECT vec_id, v, cluster, d FROM d1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1
    ), c2 AS (
      SELECT cluster, list(cd ORDER BY dim) AS c FROM (
        SELECT cluster, j AS dim,
               (floor(avg(v[j]) * 1000000.0 + 0.5) / 1000000.0) AS cd
        FROM a1, generate_series(1, 64) g(j)
        GROUP BY cluster, j
      ) GROUP BY cluster
    ), d2 AS (
      SELECT e.vec_id, c2.cluster,
             (floor(list_aggregate(list_transform(range(1, 65),
                j -> (e.v[j] - c2.c[j]) * (e.v[j] - c2.c[j])), 'sum')
                * 1000000.0 + 0.5) / 1000000.0) AS d
      FROM e CROSS JOIN c2
    ), a2 AS (
      SELECT vec_id, cluster, d FROM d2
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1
    )
    SELECT cluster, CAST(count(*) AS BIGINT) AS n_vectors,
           (floor(avg(d) * 10000.0 + 0.5) / 10000.0) AS avg_sqdist,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM a2 GROUP BY cluster ORDER BY cluster
    """,
)
def embedding_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic Lloyd iterations over the embeddings table;
    per-cluster size / mean squared distance / lowest member id. The
    oracle unrolls the identical two iterations in SQL (seed assign ->
    6dp mean centroids -> reassign), cross-joining only the k=8 centroid
    rows — the Spark plan embeds them as literal arrays instead (no
    join at all; see operators/clustering.py for the 100 TB posture)."""
    assign = clustering.kmeans_lloyd(
        table(spark, sf_dir, "embeddings"), k=8, iters=2
    )
    return (
        assign.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            hround(F.avg("d"), 4).alias("avg_sqdist"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("cluster")
    )


@register(
    "dedup_simhash_hamming",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), bits AS (
      SELECT doc_id, j,
             CAST(floor(CAST(('0x' || substr(md5(w), (j // 4) + 1, 1)) AS INT)
                  / power(2, 3 - j % 4)) AS INT) % 2 AS bit
      FROM tok, generate_series(0, 63) g(j)
    ), votes AS (
      SELECT doc_id, j, sum(bit * 2 - 1) AS vote FROM bits GROUP BY doc_id, j
    ), sigs AS (
      SELECT doc_id,
             string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
      FROM votes GROUP BY doc_id
    )
    SELECT id_a, id_b, hamming FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_filter(range(1, 65),
                  i -> substr(a.simhash, i, 1) <> substr(b.simhash, i, 1))) AS INT) AS hamming
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    ) WHERE hamming <= 3 ORDER BY id_a, id_b
    """,
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs at Hamming <= 3. The oracle is the
    O(n^2) brute-force scan; the Spark plan is the inverted-index
    banding (operators/dedup.simhash_hamming_pairs) — identical output
    by the pigeonhole exactness argument, which is the whole point."""
    return dedup.simhash_hamming_pairs(
        table(spark, sf_dir, "documents"), max_hamming=3, n_bands=4
    ).orderBy("id_a", "id_b")


@register(
    "events_ewma_daily",
    oracle="""
    WITH RECURSIVE idx AS (
      SELECT user_id, day, CAST(n AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS i
      FROM (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n
        FROM events GROUP BY user_id, day
      )
    ), r AS (
      SELECT user_id, day, i, x, x AS ewma FROM idx WHERE i = 1
      UNION ALL
      SELECT idx.user_id, idx.day, idx.i, idx.x,
             CAST(0.3 AS DOUBLE) * idx.x + CAST(0.7 AS DOUBLE) * r.ewma
      FROM r JOIN idx ON idx.user_id = r.user_id AND idx.i = r.i + 1
    )
    SELECT user_id, day, CAST(x AS BIGINT) AS n_events,
           (floor(ewma * 1000000.0 + 0.5) / 1000000.0) AS ewma
    FROM r ORDER BY user_id, day
    """,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of daily event counts, alpha=0.3: the smoothing
    primitive behind activity trend features. Each user's ordered day
    array is folded sequentially with exactly the recurrence the
    oracle's recursive CTE steps through (0.3*x + 0.7*prev — same FP
    ops, bit-identical), so the only rounding is cosmetic. One shuffle
    for the daily counts, one for the per-user fold."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    a, b = F.lit(EWMA_ALPHA), F.lit(1.0 - EWMA_ALPHA)
    acc0 = F.array().cast("array<struct<day:date,x:double,ewma:double>>")
    folded = daily.groupBy("user_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            acc0,
            lambda acc, s: F.concat(
                acc,
                F.array(
                    F.struct(
                        s["day"].alias("day"),
                        s["x"].alias("x"),
                        F.when(F.size(acc) == 0, s["x"])
                        .otherwise(a * s["x"] + b * F.element_at(acc, -1)["ewma"])
                        .alias("ewma"),
                    )
                ),
            ),
        ).alias("seq")
    )
    return (
        folded.select("user_id", F.explode("seq").alias("s"))
        .select(
            "user_id",
            F.col("s.day").alias("day"),
            F.col("s.x").cast("long").alias("n_events"),
            hround(F.col("s.ewma"), 6).alias("ewma"),
        )
        .orderBy("user_id", "day")
    )


QL_W0, QL_WSTOP, QL_WDIST, QL_WLEN = -2.0, 3.0, 2.5, 0.4


@register(
    "corpus_quality_logit",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                  x -> list_contains(['the','a','of','and','to','in','is'], x)))
                  AS n_stop,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    ), z AS (
      SELECT doc_id, source,
             {QL_W0} + {QL_WSTOP} * (n_stop / n_tokens)
                     + {QL_WDIST} * (n_distinct / n_tokens)
                     + {QL_WLEN} * ln(n_tokens) AS z
      FROM f WHERE n_tokens > 0
    )
    SELECT doc_id, source,
           (floor(z * 1000000.0 + 0.5) / 1000000.0) AS quality_logit,
           z >= 0.0 AS keep
    FROM z ORDER BY doc_id
    """,
)
def corpus_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, distilled to the Spark-side
    plumbing: score every document with a fixed linear model over
    cheap text features (the fastText/DCLM-classifier serving pattern —
    weights trained offline, inference is pure column math riding the
    corpus scan, no UDF). Scores stay in LOGIT space: the sigmoid is
    monotone, so ranking and the keep-threshold (z >= 0 == p >= 0.5)
    are identical while the oracle needs no exp() — one less libm
    surface to keep bit-aligned across engines."""
    docs = table(spark, sf_dir, "documents")
    feats = text_ops.quality_features("text")
    z = (
        F.lit(QL_W0)
        + F.lit(QL_WSTOP) * feats["stopword_ratio"]
        + F.lit(QL_WDIST) * feats["distinct_ratio"]
        + F.lit(QL_WLEN) * F.log(feats["n_tokens"].cast("double"))
    )
    return (
        docs.select("doc_id", "source", feats["n_tokens"].alias("nt"), z.alias("z"))
        .where(F.col("nt") > 0)
        .select(
            "doc_id",
            "source",
            hround("z", 6).alias("quality_logit"),
            (F.col("z") >= 0.0).alias("keep"),
        )
        .orderBy("doc_id")
    )
