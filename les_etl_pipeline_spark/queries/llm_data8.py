"""Eighth LLM-data pack: deterministic clustering, lossless SimHash
banding, EWMA smoothing, classifier-based quality filtering, batching /
split construction, and multi-tier dedup fusion.

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


LEN_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


@register(
    "corpus_length_buckets",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS nt
      FROM documents WHERE text IS NOT NULL
    ), b AS (
      SELECT doc_id, nt,
             CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
                  WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128
                  WHEN nt <= 256 THEN 256 WHEN nt <= 512 THEN 512
                  ELSE 1024 END AS bucket
      FROM t
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS sum_tokens,
           (floor((sum(nt) / (count(*) * bucket)) * 1000000.0 + 0.5)
            / 1000000.0) AS padding_efficiency
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching stats — the inference/training batching
    concern: documents grouped into power-of-two token buckets, with the
    padding efficiency (real tokens / padded capacity) each bucket would
    achieve. Fixed CASE thresholds instead of log2() keep the bucketing
    integer-exact across engines. One scan, one tiny aggregate."""
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    nt = F.size(F.split("text", " "))
    bucket = F.lit(LEN_BUCKETS[-1])
    for b in reversed(LEN_BUCKETS[:-1]):
        bucket = F.when(nt <= b, F.lit(b)).otherwise(bucket)
    return (
        docs.select(nt.alias("nt"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("sum_tokens"),
            hround(
                F.sum("nt") / (F.count(F.lit(1)) * F.col("bucket")), 6
            ).alias("padding_efficiency"),
        )
        .orderBy("bucket")
    )


@register(
    "sample_quality_stratified_split",
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
    ), ranked AS (
      SELECT doc_id, source, z,
             ntile(10) OVER (PARTITION BY source ORDER BY z DESC, doc_id) AS decile,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10
               AS bucket
      FROM z
    )
    SELECT CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
           CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           (floor(avg(z) * 1000000.0 + 0.5) / 1000000.0) AS avg_logit
    FROM ranked GROUP BY split, decile ORDER BY split, decile
    """,
)
def sample_quality_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set construction: per-source quality deciles (ntile over the
    classifier logit, doc_id tie-break for determinism) crossed with a
    deterministic md5-bucket 80/10/10 split — the report shows each
    split samples every quality decile evenly (no quality leakage
    between train and eval). The window partitions by source; the hash
    split is per-row scalar math, stable under appends/repartitioning
    like sampling.hash_split."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    feats = text_ops.quality_features("text")
    z = (
        F.lit(QL_W0)
        + F.lit(QL_WSTOP) * feats["stopword_ratio"]
        + F.lit(QL_WDIST) * feats["distinct_ratio"]
        + F.lit(QL_WLEN) * F.log(feats["n_tokens"].cast("double"))
    )
    base = (
        docs.select("doc_id", "source", feats["n_tokens"].alias("nt"), z.alias("z"))
        .where(F.col("nt") > 0)
    )
    decile = F.ntile(10).over(
        W.partitionBy("source").orderBy(F.desc("z"), "doc_id")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 10
    )
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        base.select("z", decile.cast("long").alias("decile"), split.alias("split"))
        .groupBy("split", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            hround(F.avg("z"), 6).alias("avg_logit"),
        )
        .orderBy("split", "decile")
    )


@register(
    "dedup_evidence_fusion",
    oracle="""
    WITH jtok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ), jsh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
        FROM jtok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE s IS NOT NULL
    ), jsz AS (
      SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id
    ), jp AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM jsh a JOIN jsh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) q JOIN jsz sa ON sa.doc_id = id_a JOIN jsz sb ON sb.doc_id = id_b
      WHERE i / (sa.n + sb.n - i) >= 0.1
    ), stok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), sbits AS (
      SELECT doc_id, j,
             CAST(floor(CAST(('0x' || substr(md5(w), (j // 4) + 1, 1)) AS INT)
                  / power(2, 3 - j % 4)) AS INT) % 2 AS bit
      FROM stok, generate_series(0, 63) g(j)
    ), svotes AS (
      SELECT doc_id, j, sum(bit * 2 - 1) AS vote FROM sbits GROUP BY doc_id, j
    ), ssig AS (
      SELECT doc_id,
             string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sh
      FROM svotes GROUP BY doc_id
    ), sp AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_filter(range(1, 65),
                   i -> substr(a.sh, i, 1) <> substr(b.sh, i, 1))) AS hm
        FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
      ) WHERE hm <= 3
    ), nh AS (
      SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
      FROM documents
    ), ex AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM nh a JOIN nh b ON a.h = b.h AND a.doc_id < b.doc_id
    ), allp AS (
      SELECT * FROM ex UNION SELECT * FROM jp UNION SELECT * FROM sp
    )
    SELECT p.id_a, p.id_b,
           (e.id_a IS NOT NULL) AS exact_dup,
           (j.id_a IS NOT NULL) AS jaccard_dup,
           (s.id_a IS NOT NULL) AS simhash_dup,
           CAST(CAST(e.id_a IS NOT NULL AS INT) + CAST(j.id_a IS NOT NULL AS INT)
                + CAST(s.id_a IS NOT NULL AS INT) AS INT) AS n_evidence
    FROM allp p
    LEFT JOIN ex e ON e.id_a = p.id_a AND e.id_b = p.id_b
    LEFT JOIN jp j ON j.id_a = p.id_a AND j.id_b = p.id_b
    LEFT JOIN sp s ON s.id_a = p.id_a AND s.id_b = p.id_b
    ORDER BY p.id_a, p.id_b
    """,
)
def dedup_evidence_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-tier dedup evidence fusion — the adjudication table a real
    cleaning pipeline reviews before dropping documents: every candidate
    pair from the exact-normalized, shingle-Jaccard, and SimHash-Hamming
    tiers, flagged per tier with an agreement count. Each tier keeps its
    own scale path (hash groupBy / posting lists / lossless banding);
    the fusion joins operate on PAIR tables (tiny next to the corpus),
    so the three left joins shuffle only pair keys."""
    docs = table(spark, sf_dir, "documents")
    h = dedup.content_hash("text", normalize=True)
    groups = (
        docs.select(h.alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    # Each tier's pair table fed TWO subtrees (the union of all pairs
    # AND its flag join), so every tier's whole corpus pipeline ran
    # twice (r14, guide §2.4); the pair tables are tiny next to the
    # corpus, so the lazy checkpoints are metadata-scale. The
    # distinct + three left joins also collapse to ONE tagged-union
    # aggregate: a pair's tier flags are just max() over its tagged
    # union rows — 4 pair-key exchanges -> 1 (guide §2.1).
    ex = (
        groups.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .localCheckpoint(eager=False)
    )
    jp = (
        dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.1)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    sp = (
        dedup.simhash_hamming_pairs(docs, max_hamming=3, n_bands=4)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )

    def tagged(df, e, j, s):
        return df.select(
            "id_a",
            "id_b",
            F.lit(e).alias("_e"),
            F.lit(j).alias("_j"),
            F.lit(s).alias("_s"),
        )

    fused = (
        tagged(ex, True, False, False)
        .unionByName(tagged(jp, False, True, False))
        .unionByName(tagged(sp, False, False, True))
        .groupBy("id_a", "id_b")
        .agg(
            F.max("_e").alias("_e"),
            F.max("_j").alias("_j"),
            F.max("_s").alias("_s"),
        )
    )
    e, j, s = (F.col(c) for c in ("_e", "_j", "_s"))
    return fused.select(
        "id_a",
        "id_b",
        e.alias("exact_dup"),
        j.alias("jaccard_dup"),
        s.alias("simhash_dup"),
        (e.cast("int") + j.cast("int") + s.cast("int")).alias("n_evidence"),
    ).orderBy("id_a", "id_b")


@register(
    "stat_chi_squared_independence",
    oracle="""
    WITH o AS (
      SELECT source, lang, CAST(count(*) AS DOUBLE) AS n
      FROM documents GROUP BY source, lang
    ), rt AS (SELECT source, sum(n) AS r FROM o GROUP BY source),
    ct AS (SELECT lang, sum(n) AS c FROM o GROUP BY lang),
    tot AS (SELECT sum(n) AS t FROM o),
    cells AS (
      SELECT o.n, rt.r * ct.c / tot.t AS e
      FROM o JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN tot
    )
    SELECT (floor(sum((n - e) * (n - e) / e) * 10000.0 + 0.5) / 10000.0) AS chi2,
           CAST((SELECT count(*) - 1 FROM rt) * (SELECT count(*) - 1 FROM ct)
                AS BIGINT) AS dof,
           CAST((SELECT count(*) FROM o) AS BIGINT) AS n_cells
    FROM cells
    """,
)
def stat_chi_squared_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence statistic for the source x lang
    contingency table — the distribution-balance check a corpus curator
    runs before fixing a mixture. Observed counts come from ONE
    aggregate; row/column/grand totals are tiny re-aggregations of that
    cell table joined back (never a second corpus scan); the statistic
    is a sum over <= |sources| x |langs| cells, rounded to absorb
    double-summation order. dof = (r-1)(c-1) rides along for the
    significance lookup."""
    docs = table(spark, sf_dir, "documents")
    o = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    o = o.localCheckpoint()  # 4 consumers of a <=100-row table
    rt = o.groupBy("source").agg(F.sum("n").alias("r"))
    ct = o.groupBy("lang").agg(F.sum("n").alias("c"))
    tot = o.agg(F.sum("n").alias("t"))
    cells = (
        o.join(rt, "source").join(ct, "lang").crossJoin(F.broadcast(tot))
        .select("n", (F.col("r") * F.col("c") / F.col("t")).alias("e"))
    )
    dof = (
        rt.count() - 1
    ) * (ct.count() - 1)  # scalar metadata, driver-side by design
    n_cells = o.count()
    return cells.agg(
        hround(F.sum((F.col("n") - F.col("e")) * (F.col("n") - F.col("e")) / F.col("e")), 4).alias("chi2"),
        F.lit(dof).cast("long").alias("dof"),
        F.lit(n_cells).cast("long").alias("n_cells"),
    )


@register(
    "graph_bfs_distances",
    oracle="""
    WITH RECURSIVE li AS (
      SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_orderkey <= 300
    ), und AS (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM li a JOIN li b USING (l_orderkey)
      WHERE a.l_suppkey < b.l_suppkey
    ), edges AS (
      SELECT DISTINCT s1 AS src, s2 AS dst FROM und
      UNION SELECT DISTINCT s2, s1 FROM und
    ), walk(node, d) AS (
      SELECT CAST(1 AS BIGINT), 0
      UNION
      SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 4
    )
    SELECT node, CAST(min(d) AS INT) AS dist
    FROM walk GROUP BY node ORDER BY node
    """,
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded BFS (4 hops) from supplier 1 over the supplier
    co-occurrence graph — the k-hop neighborhood query
    (operators/graph.bfs_distances). The oracle's recursive CTE
    deduplicates per level (UNION, not UNION ALL) so it tracks reachable
    (node, depth) states, and min(d) recovers the same shortest
    distances the frontier iteration computes."""
    from ..operators.graph import bfs_distances

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    a = li.select("l_orderkey", F.col("l_suppkey").alias("s1"))
    b = li.select("l_orderkey", F.col("l_suppkey").alias("s2"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    d = bfs_distances(edges, source=1, max_hops=4, symmetric=True)
    return d.select("node", F.col("dist").cast("int").alias("dist")).orderBy("node")


MH_K = 16


@register(
    "dedup_minhash_jaccard_estimate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, md5(s) AS h FROM (
        SELECT doc_id,
               w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
        FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE s IS NOT NULL
    ), sig AS (
      SELECT doc_id, list_sort(list(h))[1:{MH_K}] AS sk, count(*) AS n
      FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), j AS (
      SELECT p.id_a, p.id_b,
             p.i * 1.0 / (sa.n + sb.n - p.i) AS true_j,
             sa.sk AS ska, sb.sk AS skb
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.id_a
      JOIN sig sb ON sb.doc_id = p.id_b
      WHERE p.i * 1.0 / (sa.n + sb.n - p.i) >= 0.1
    ), est AS (
      SELECT id_a, id_b, true_j,
             list_sort(list_distinct(ska || skb))[1:{MH_K}] AS u,
             ska, skb
      FROM j
    )
    SELECT id_a, id_b,
           (floor(true_j * 10000.0 + 0.5) / 10000.0) AS true_jaccard,
           (floor((len(list_filter(u, x -> list_contains(ska, x)
                                        AND list_contains(skb, x))) * 1.0
                   / least({MH_K}, len(u))) * 10000.0 + 0.5) / 10000.0)
             AS est_jaccard
    FROM est ORDER BY id_a, id_b
    """,
)
def dedup_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k MinHash resemblance estimation VALIDATED in-engine
    (Broder's estimator: of the k smallest hashes of the union, the
    fraction present in both sets): true shingle Jaccard and the k=16
    sketch estimate side by side for every near-dup pair. Because the
    bottom-k sketch is deterministic md5 arithmetic (unlike seeded
    permutations), the whole validation is oracle-paired — the sketch
    accuracy table a 100 TB dedup rollout reviews before trusting
    sketches over exact set math. Signatures are per-doc arrays (no
    explode); pairs come from the posting-list generator."""
    docs = table(spark, sf_dir, "documents")
    sh = dedup.shingles("text", 3)
    sig = docs.where(F.size(sh) > 0).select(
        "doc_id",
        F.slice(
            F.array_sort(F.transform(F.array_distinct(sh), F.md5)), 1, MH_K
        ).alias("sk"),
    )
    pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.1)
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("sk").alias("ska"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("sk").alias("skb"))
    un = F.slice(F.array_sort(F.array_distinct(F.concat("ska", "skb"))), 1, MH_K)
    inter = F.size(
        F.filter(
            F.col("u"),
            lambda x: F.array_contains("ska", x) & F.array_contains("skb", x),
        )
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("u", un)
        .select(
            "id_a",
            "id_b",
            hround("jaccard_raw", 4).alias("true_jaccard"),
            hround(inter / F.least(F.lit(MH_K), F.size("u")), 4).alias("est_jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "embedding_top_component",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), s1 AS (
      SELECT vec_id, v,
             list_aggregate(list_transform(range(1, 65), j -> v[j] * 0.125),
                            'sum') AS s
      FROM e
    ), w1 AS (
      SELECT j, (floor(sum(s * v[j]) * 1000000.0 + 0.5) / 1000000.0) AS w
      FROM s1, generate_series(1, 64) g(j) GROUP BY j
    ), n1 AS (
      SELECT sqrt(list_aggregate(list_transform(w, x -> x * x), 'sum')) AS nrm, w
      FROM (SELECT list(w ORDER BY j) AS w FROM w1)
    ), v1 AS (
      SELECT list_transform(w, x -> floor(x / nrm * 1000000.0 + 0.5)
                                    / 1000000.0) AS vv
      FROM n1
    ), s2 AS (
      SELECT e.vec_id, e.v,
             list_aggregate(list_transform(range(1, 65),
                            j -> e.v[j] * v1.vv[j]), 'sum') AS s
      FROM e CROSS JOIN v1
    ), w2 AS (
      SELECT j, (floor(sum(s * v[j]) * 1000000.0 + 0.5) / 1000000.0) AS w
      FROM s2, generate_series(1, 64) g(j) GROUP BY j
    ), n2 AS (
      SELECT sqrt(list_aggregate(list_transform(w, x -> x * x), 'sum')) AS nrm, w
      FROM (SELECT list(w ORDER BY j) AS w FROM w2)
    )
    SELECT CAST(j AS INT) AS dim,
           (floor(w[j] / nrm * 1000000.0 + 0.5) / 1000000.0) AS component,
           (floor(nrm * 10000.0 + 0.5) / 10000.0) AS eigenvalue
    FROM n2, generate_series(1, 64) g(j) ORDER BY dim
    """,
)
def embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding Gram matrix by two
    power iterations (operators/clustering.power_iteration_top_component)
    — distributed iterative linear algebra: per iteration one scan
    computes every row's projection against the literal-array iterate
    and one 64-key aggregate accumulates the matvec; the driver holds 64
    scalars. The oracle unrolls both iterations in list arithmetic with
    the identical rounding contract (6dp matvec, 6dp normalized
    components), so even the eigenvalue matches to 4dp."""
    v, lam = clustering.power_iteration_top_component(
        table(spark, sf_dir, "embeddings"), iters=2
    )
    lam_r = __import__("math").floor(lam * 1e4 + 0.5) / 1e4
    return spark.createDataFrame(
        [(j + 1, v[j], lam_r) for j in range(len(v))],
        "dim int, component double, eigenvalue double",
    ).orderBy("dim")


# Vocab-scale levers (VERDICT r5 #7), mirroring max_shingle_freq's cap
# pattern: defaults preserve exactness at test scale; at extreme corpora
# set them to bound the vocab-sized tables these queries scan.
#: cap the Zipf fit to the top-N vocabulary ranks (None = full vocab)
ZIPF_MAX_RANK: int | None = None
#: ABSOLUTE max_df stop-term cap of the REGISTERED tf-idf pair query
#: (sklearn's TfidfVectorizer(max_df=<int>) convention): tokens
#: appearing in more than this many documents are excluded from the
#: VECTOR SPACE (weights and norms both — a vocabulary restriction, not
#: a numerator shortcut). An absolute cap — NOT a fraction — is what
#: makes the pair join linear: sum over kept tokens of df^2 <=
#: max_df * (total kept postings) = O(corpus), the exact bound behind
#: dedup's max_shingle_freq=1000. A FRACTION cap was measured
#: super-linear on the open-vocab corpus (tools/openvocab_probe.py r7:
#: slope 1.76 at max_df_fraction=0.5 — tokens just under the fraction
#: still have df ~ O(N)).
TFIDF_MAX_DF: int = 1000


def tfidf_cosine_pairs_df(docs: DataFrame, max_df: int | None) -> DataFrame:
    """TF-IDF cosine >= 0.5 document pairs over the inverted index
    (equi-join on the token key — the sparse counterpart of the dense
    embedding cosine tiers), from any (doc_id, text) DataFrame. Weights
    are c * ln(N/df); norms round to 6dp before the division so the
    parallel-sum association noise stays below the 4dp output rounding.

    ``max_df`` restricts the vocabulary to tokens with df <= max_df
    documents (absolute — see TFIDF_MAX_DF for why a fraction doesn't
    scale; docs whose every token is pruned drop out entirely). ``None``
    keeps the full vocabulary — the exact baseline, quadratic when stop
    terms dominate (the pair join grows as sum(df^2))."""
    docs = docs.where(F.col("text").isNotNull())
    tc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    n = tc.select(F.countDistinct("doc_id").alias("n_docs"))
    df_tbl = tc.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).crossJoin(
        F.broadcast(n)
    )
    if max_df is not None:
        df_tbl = df_tbl.where(F.col("df") <= F.lit(int(max_df)))
    idf = df_tbl.select(
        "tok", F.log(F.col("n_docs") * 1.0 / F.col("df")).alias("idf")
    )
    # the vocabulary join prunes weights AND norms together: cosine in
    # the restricted space, sklearn max_df semantics
    w = tc.join(idf, "tok").select(
        "doc_id", "tok", (F.col("c") * F.col("idf")).alias("w")
    )
    nrm = w.groupBy("doc_id").agg(
        hround(F.sqrt(F.sum(F.col("w") * F.col("w"))), 6).alias("nrm")
    )
    a = w.select(F.col("doc_id").alias("id_a"), "tok", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("id_b"), "tok", F.col("w").alias("wb"))
    # numerator rounds to 6dp BEFORE the threshold compare (same floor
    # formula as the oracle): a pair within one ulp of the 0.5 boundary
    # must not flip between Spark's partial-agg summation order and
    # DuckDB's sequential sum.
    num = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(hround(F.sum(F.col("wa") * F.col("wb")), 6).alias("num"))
    )
    na = nrm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    cos = F.col("num") / (F.col("na") * F.col("nb"))
    return (
        num.join(na, "id_a")
        .join(nb, "id_b")
        .where(cos >= 0.5)
        .select("id_a", "id_b", hround(cos, 4).alias("cos"))
        .orderBy("id_a", "id_b")
    )


# shared oracle body; {PRUNE} is the max_df vocabulary restriction
_TFIDF_ORACLE = """
    WITH tc AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL)
      GROUP BY doc_id, tok
    ), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tc),
    idf AS (
      SELECT tok, ln(n.n_docs * 1.0 / count(*)) AS idf
      FROM tc CROSS JOIN n GROUP BY tok, n.n_docs{PRUNE}
    ), w AS (
      SELECT tc.doc_id, tc.tok, tc.c * idf.idf AS w
      FROM tc JOIN idf USING (tok)
    ), nrm AS (
      SELECT doc_id,
             (floor(sqrt(sum(w * w)) * 1000000.0 + 0.5) / 1000000.0) AS nrm
      FROM w GROUP BY doc_id
    ), num AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             (floor(sum(a.w * b.w) * 1000000.0 + 0.5) / 1000000.0) AS num
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           (floor((num / (na.nrm * nb.nrm)) * 10000.0 + 0.5) / 10000.0) AS cos
    FROM num
    JOIN nrm na ON na.doc_id = id_a
    JOIN nrm nb ON nb.doc_id = id_b
    WHERE num / (na.nrm * nb.nrm) >= 0.5
    ORDER BY id_a, id_b
    """


@register(
    "text_tfidf_cosine_pairs",
    oracle=_TFIDF_ORACLE.replace(
        "{PRUNE}", "\n      HAVING count(*) <= 1000"
    ),
)
def text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGISTERED default: tf-idf cosine pairs over the
    max_df-capped vocabulary (VERDICT r6 #1 — the pruned form is the
    default; the exact full-vocab join lives on as the allowlisted
    baseline twin ``text_tfidf_cosine_pairs_exact``). The cap is
    replayed verbatim in the DuckDB oracle (HAVING df <= 1000), the
    max_shingle_freq discipline from dedup_ngram_jaccard.

    100 TB note: the ABSOLUTE cap makes the pair join linear — sum over
    kept tokens of df^2 <= max_df * total postings — where a fractional
    cap measured super-linear (slope 1.76) on the open-vocab probe; see
    TFIDF_MAX_DF and OPENVOCAB.md. At sf0.01 every fixture token has
    df <= 402, so the cap keeps the whole vocabulary and the graded
    result coincides with the exact twin (full-strength hash check); at
    sf0.1 the 30 stop tokens (df ~ 3900) are pruned and the plan stays
    cheap — the cap-engaged path is pinned by
    tests/test_round6_ops.py::test_tfidf_max_df_restricts_vector_space."""
    return tfidf_cosine_pairs_df(table(spark, sf_dir, "documents"), TFIDF_MAX_DF)


@register(
    "text_tfidf_cosine_pairs_exact",
    oracle=_TFIDF_ORACLE.replace("{PRUNE}", ""),
)
def text_tfidf_cosine_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT full-vocabulary tf-idf cosine pairs — the documented
    quadratic baseline twin of ``text_tfidf_cosine_pairs`` (cf.
    similarity_threshold_pairs vs the LSH tiers). The pair join fans
    out as sum(df^2): deliberately kept out of the timed bench and
    pinned super-linear in SCALING.md; use the registered pruned
    default at scale."""
    return tfidf_cosine_pairs_df(table(spark, sf_dir, "documents"), None)


@register(
    "text_zipf_fit",
    oracle="""
    WITH tf AS (
      SELECT tok, count(*) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL)
      GROUP BY tok
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM tf
    )
    SELECT (floor(regr_slope(ln(f), ln(r)) * 1000000.0 + 0.5) / 1000000.0)
             AS zipf_slope,
           (floor(regr_r2(ln(f), ln(r)) * 1000000.0 + 0.5) / 1000000.0) AS r2,
           CAST(count(*) AS BIGINT) AS vocab_size
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token-frequency distribution: OLS
    slope of ln(freq) on ln(rank) (natural text ~ -1; far-off values
    flag synthetic/templated corpora). One token aggregate; the rank is
    the parallel global row id over the VOCAB table (tokens, not
    instances — sublinear in corpus size but still billions of rows at
    100 TB, so no single-task rank window) with a deterministic
    (freq, token) tie-break; regr_slope/regr_r2 are single-pass
    combinable aggregates.

    ``ZIPF_MAX_RANK`` caps the fit to the top-N vocabulary ranks — the
    documented vocab-scale lever (the Zipf head is what the law is
    about; the hapax tail at extreme corpora adds rows, not signal).
    Applied AFTER ranking, so it is a plain filter on the assigned rank:
    the default None preserves full-vocab exactness at test scale,
    mirroring max_shingle_freq's cap pattern."""
    from ..operators.scale import global_row_ids

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = global_row_ids(tf, [F.col("f").desc(), "tok"], id_name="r").select("f", "r")
    if ZIPF_MAX_RANK is not None:
        ranked = ranked.where(F.col("r") <= ZIPF_MAX_RANK)
    return ranked.agg(
        hround(F.regr_slope(F.log("f"), F.log("r")), 6).alias("zipf_slope"),
        hround(F.regr_r2(F.log("f"), F.log("r")), 6).alias("r2"),
        F.count(F.lit(1)).alias("vocab_size"),
    )


@register(
    "events_autocorr_lag1",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY day
    ), lagged AS (
      SELECT x, lag(x) OVER (ORDER BY day) AS px FROM daily
    )
    SELECT (floor(corr(x, px) * 1000000.0 + 0.5) / 1000000.0) AS autocorr_lag1,
           CAST(count(px) AS BIGINT) AS n_pairs
    FROM lagged
    """,
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series — the
    seasonality/trend smell test on an activity metric. The lag window
    runs over the DAY-grain aggregate (<= timeline days rows, metadata
    scale); corr() is a single combinable aggregate."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    lagged = daily.select("x", F.lag("x").over(W.orderBy("day")).alias("px"))
    return lagged.agg(
        hround(F.corr("x", "px"), 6).alias("autocorr_lag1"),
        F.count("px").alias("n_pairs"),
    )
