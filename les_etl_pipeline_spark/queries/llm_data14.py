"""Fourteenth LLM-data pack (round 13):

- ``similarity_ivf_pq_recall``: ANN index-quality monitoring as a
  REGISTERED query (VERDICT r12 #6): per-query recall@k of the IVF-PQ
  index against the exact brute-force top-k, computed by joining the
  two already-registered (and individually bit-exact) result sets. The
  oracle composes the two registered oracle SQL strings verbatim as
  CTE subqueries, so all three stay in lockstep by construction — any
  drift in the index's ranking shows up as a recall movement the
  driver's value-hash gate flags, not just a pytest bound.

- ``dedup_incremental_cc_fold``: the incremental connected-components
  maintenance path (streaming/dedup_index.fold_clusters, VERDICT r12
  #5) driver-graded as a batch query: the jaccard pair graph is split
  into three chunks and folded sequentially into a cluster table from
  empty — the result must equal one-shot CC (the same recursive-CTE
  closure oracle as ``dedup_cluster_components``), making the
  merge-event relabeling logic itself hash-gated, not only pinned in
  the streaming test.

Scale shape: the recall join is top-k x top-k (metadata-scale); each
CC fold contracts its chunk's edges to cluster-level merge events, so
per-fold work is O(chunk edges), never corpus x corpus.

Reference parity: none (no ANN/dedup surface in the reference —
SURVEY.md §2.12 gap family; LLM-data operators from the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from .registry import ORACLES, register

#: k of both underlying top-k queries (similarity_bruteforce_topk and
#: similarity_ivf_pq_topk registrations)
_K = 5

# exact side: the registered brute-force oracle runs queries vec_id<10;
# the IVF-PQ registration runs vec_id<8 — restrict the exact side to the
# common query set AFTER the verbatim subquery so the strings stay
# untouched copies of the graded registrations
_RECALL_ORACLE = f"""
    WITH exact_tk AS (
      SELECT query_id, neighbor_id
      FROM ({ORACLES["similarity_bruteforce_topk"]})
      WHERE query_id < 8
    ), ann_tk AS (
      SELECT query_id, neighbor_id
      FROM ({ORACLES["similarity_ivf_pq_topk"]})
    )
    SELECT e.query_id,
           CAST(count(a.neighbor_id) AS INT) AS n_hits,
           (floor(count(a.neighbor_id) * 1.0 / {_K} * 1000000.0 + 0.5)
            / 1000000.0) AS recall_at_k
    FROM exact_tk e
    LEFT JOIN ann_tk a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    ORDER BY e.query_id
"""


@register("similarity_ivf_pq_recall", oracle=_RECALL_ORACLE)
def similarity_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF-PQ index vs exact brute force, per query
    vector — the index-quality regression monitor (VERDICT r12 #6).
    Parameters mirror the two underlying registrations exactly
    (``similarity_ivf_pq_topk``: n_cells=8, n_probe=4, m=8, n_codes=16,
    rerank=50, queries vec_id<8; ``similarity_bruteforce_topk``: k=5,
    queries vec_id<10 restricted here to the common vec_id<8 set). A
    pinned floor lives in tests/test_similarity_pq.py."""
    from ..operators.similarity import cosine_topk, ivf_pq_topk

    emb = table(spark, sf_dir, "embeddings")
    ann = ivf_pq_topk(
        emb, F.col("vec_id") < 8, k=_K, n_cells=8, n_probe=4, m=8,
        n_codes=16, rerank=50,
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    exact = (
        cosine_topk(emb, F.col("vec_id") < 10, k=_K)
        .where(F.col("query_id") < 8)
        .select("query_id", "neighbor_id")
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("int").alias("n_hits"),
            hround(F.count("hit") / F.lit(_K), 6).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


def _cc_fold_oracle() -> str:
    from .llm_data import _JACCARD_PAIRS_CTE

    return (
        "WITH RECURSIVE "
        + _JACCARD_PAIRS_CTE.replace("WITH tok", "tok", 1).lstrip()
        + """
    , edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster
    FROM reach GROUP BY a
    ORDER BY doc_id
    """
    )


@register("dedup_incremental_cc_fold", oracle=_cc_fold_oracle())
def dedup_incremental_cc_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CC maintenance as a graded batch query: the jaccard
    pair graph folds into a cluster table in three chunks via
    streaming/dedup_index.fold_clusters (endpoints resolve to current
    labels, edges contract to cluster-level merge events, CC runs on
    the contracted graph only, merge map relabels) — and the folded
    result must equal one-shot connected components (recursive-CTE
    closure oracle, same as dedup_cluster_components). The chunk split
    (xxhash64) is an internal grouping key the output is INDEPENDENT of
    — any 3-way split folds to the same components."""
    from ..operators import dedup
    from ..streaming.dedup_index import CLUSTERS_SCHEMA, fold_clusters

    pairs = (
        dedup.ngram_jaccard_pairs(
            table(spark, sf_dir, "documents"), k=3, threshold=0.1
        )
        .select("id_a", "id_b")
        .withColumn("_chunk", F.pmod(F.xxhash64("id_a", "id_b"), F.lit(3)))
        .localCheckpoint()  # three chunk consumers — fold once, not 3x
    )
    clusters = spark.createDataFrame([], CLUSTERS_SCHEMA)
    for c in range(3):
        clusters = fold_clusters(
            clusters, pairs.where(F.col("_chunk") == c).select("id_a", "id_b")
        ).localCheckpoint()  # each fold joins the prior table twice
    return clusters.orderBy("doc_id")


_BND_D, _BND_BITS, _BND_TABLES, _BND_CAP, _BND_T = 64, 6, 12, 40, 0.4


def _banded_cte() -> str:
    """The shared CTE chain replaying cosine_banded_pairs verbatim: the
    SAME md5-parity hyperplane literals (driver-side computation feeds
    both sides — the r8 LSH trick), the same md5 sub-bucket split
    (SemDeDup idiom), the same exact-cosine verify. Composed into the
    pair query's oracle AND the corpus survivor query's recursive
    closure so the two stay in lockstep by construction."""
    from ..operators import similarity

    planes = similarity.rh_planes(_BND_D, _BND_BITS, _BND_TABLES)

    def bucket(t: int) -> str:
        return " + ".join(
            "(CASE WHEN list_aggregate(list_apply(list_zip(v, ["
            + ", ".join(repr(s) for s in planes[t][j])
            + "]), x -> x[1] * x[2]), 'sum') >= 0.0 THEN "
            + str(1 << j)
            + " ELSE 0 END)"
            for j in range(_BND_BITS)
        )

    hashes = "\n      UNION ALL\n      ".join(
        f"SELECT vec_id AS id, {t} AS t, ({bucket(t)}) AS b FROM n"
        for t in range(_BND_TABLES)
    )
    return f"""e AS (
      SELECT vec_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_aggregate(list_apply(v, x -> x * x), 'sum')) AS nrm
      FROM e WHERE sqrt(list_aggregate(list_apply(v, x -> x * x), 'sum')) > 0
    ), h AS (
      {hashes}
    ), sizes AS (
      SELECT t, b, CAST(ceil(count(*) / {_BND_CAP}.0) AS BIGINT) AS n_sub
      FROM h GROUP BY t, b
    ), hs AS (
      SELECT h.id, h.t, h.b,
             ('0x' || substr(md5(CAST(h.id AS VARCHAR)), 1, 7))::BIGINT
               % s.n_sub AS sub
      FROM h JOIN sizes s USING (t, b)
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM hs a JOIN hs b
        ON a.t = b.t AND a.b = b.b AND a.sub = b.sub AND a.id < b.id
    ), scored AS (
      SELECT cand.id_a, cand.id_b,
             list_aggregate(list_apply(list_zip(na.v, nb.v),
               x -> x[1] * x[2]), 'sum') / (na.nrm * nb.nrm) AS cos
      FROM cand
      JOIN n na ON na.vec_id = cand.id_a
      JOIN n nb ON nb.vec_id = cand.id_b
    )"""


def _banded_pairs_oracle() -> str:
    return f"""
    WITH {_banded_cte()}
    SELECT id_a, id_b,
           (floor(cos * 1000000.0 + 0.5) / 1000000.0) AS cosine
    FROM scored WHERE cos >= {_BND_T}
    ORDER BY id_a, id_b
    """


def _banded_corpus_oracle() -> str:
    """The banded pair set closed into components: edges are the
    banded pairs at the threshold, reach is the recursive closure, and
    a doc drops iff its component has a smaller member — the same
    survivor rule as the exact-tier embedding dedup oracles."""
    return f"""
    WITH RECURSIVE {_banded_cte()}, pairs AS (
      SELECT id_a, id_b FROM scored WHERE cos >= {_BND_T}
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a
    ), drop_docs AS (
      SELECT a AS doc_id FROM reach GROUP BY a
      HAVING least(a, min(b)) != a
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_docs)
    """


@register("dedup_embedding_cosine_banded", oracle=_banded_pairs_oracle())
def dedup_embedding_cosine_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-expansion embedding near-dup pairs (round-13 measurement
    follow-up): the full-registry SCALING sweep showed both existing
    cosine-pair forms quadratic on this fixture — necessarily so, since
    the TRUE pair set at threshold 0.4 grows as n^2 (measured constant
    density 5e-4: 59 pairs at 500 vectors -> 920 at 2000; isotropic
    synthetic embeddings), and the ml-BRP LSH's bucketLength=2.0 hashes
    degenerate to 2 buckets on unit vectors. This tier restores a
    SCALE GUARANTEE by trading recall, deterministically: hyperplane-
    banded candidates with every (table, bucket) cell hash-sub-split to
    <= ~{cap} members give O(n x {cap} x {t}) pair expansion BY
    CONSTRUCTION (pinned adversarially in tests/test_similarity_banded
    .py), and the md5 planes + md5 sub-split replay verbatim in DuckDB
    so the <1 recall is hash-graded, not hand-waved. Loose-threshold
    semantic dedup at full recall belongs to dedup_semantic_prune
    (cluster-bounded); exact recall belongs to the labeled quadratic
    baselines.""".format(cap=_BND_CAP, t=_BND_TABLES)
    from ..operators import similarity

    return (
        similarity.cosine_banded_pairs(
            table(spark, sf_dir, "embeddings"),
            threshold=_BND_T,
            d_in=_BND_D,
            n_bits=_BND_BITS,
            num_tables=_BND_TABLES,
            max_bucket=_BND_CAP,
        )
        .select("id_a", "id_b", hround(F.col("cos"), 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


@register("dedup_embedding_cosine_banded_corpus", oracle=_banded_corpus_oracle())
def dedup_embedding_cosine_banded_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level semantic dedup through the bounded-expansion banded
    tier — documents in, survivors out (VERDICT r13 #1): the operator
    default ``embedding_cosine_dedup(method='banded')`` generates
    hyperplane-banded candidate pairs with per-cell sub-split caps
    (O(n * max_bucket * tables) expansion by construction), clusters
    them with connected components, and keeps each component's
    minimum-id canonical. The oracle closes the SAME deterministic
    banded pair set (md5 planes + md5 sub-split, shared CTE with
    ``dedup_embedding_cosine_banded``) with a recursive CTE, so the
    whole survivors pipeline — not just the pair stage — is hash-graded.
    The quadratic full-recall siblings stay registered as labeled
    baselines (``dedup_embedding_cosine`` / ``_lsh``); banded-vs-exact
    survivor recall is pinned in tests/test_similarity_banded.py."""
    from ..operators import dedup

    out = dedup.embedding_cosine_dedup(
        table(spark, sf_dir, "documents"),
        table(spark, sf_dir, "embeddings"),
        threshold=_BND_T,
        d_in=_BND_D,
        n_bits=_BND_BITS,
        num_tables=_BND_TABLES,
        max_bucket=_BND_CAP,
    )
    return out.select("doc_id", "lang", "source")
