"""Fourteenth LLM-data pack (round 13):

- ``similarity_ivf_pq_recall``: ANN index-quality monitoring as a
  REGISTERED query (VERDICT r12 #6): per-query recall@k of the IVF-PQ
  index against the exact brute-force top-k, computed by joining the
  two already-registered (and individually bit-exact) result sets. The
  oracle composes the two registered oracle SQL strings verbatim as
  CTE subqueries, so all three stay in lockstep by construction — any
  drift in the index's ranking shows up as a recall movement the
  driver's value-hash gate flags, not just a pytest bound.

Scale shape: the join is top-k-result x top-k-result (q x k rows per
side — metadata-scale regardless of corpus size); the expensive parts
are the two index scans the underlying queries already pay.

Reference parity: none (no ANN surface in the reference — SURVEY.md
§2.12 gap family; LLM-data operators from the build brief).
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
