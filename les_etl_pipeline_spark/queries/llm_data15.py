"""Fifteenth LLM-data pack (round 14):

- ``stream_ann_index_recall``: the STREAMING ANN index lifecycle
  driver-graded end-to-end (VERDICT r13 #3). The batch monitor
  (``similarity_ivf_pq_recall``) catches quantizer regressions, but the
  persisted-index path — bootstrap-train on the first micro-batch,
  assign-and-append on later batches, tombstone deletes, compaction
  into a new generation, epoch/pointer resolution — was watched only by
  pytest. This query rebuilds that index deterministically from the
  ``embeddings`` table inside a scratch dir, replays
  ``streaming.ann_index.ivf_search_index`` over it, and reports
  per-query recall@k against the exact brute-force top-k over the LIVE
  (non-deleted) vectors. Every stage replays in DuckDB: the quantizer
  is the deterministic Lloyd pass restricted to the bootstrap batch
  (``train_sql``), tombstones are a candidate-exclusion predicate
  (``exclude_sql``), and search is the shared rounded-probe/raw-cosine
  contract — so index corruption ANYWHERE in the lifecycle (a
  compaction dropping a cell, a generation pointer resolving stale, a
  tombstone not honored) moves a driver-graded hash, not just a pytest
  bound.

Scale shape: the drain is the production ingest path (per batch
O(batch x n_cells) scalar arithmetic, no shuffle); compaction clusters
the inverted file by cell; search broadcasts centroids + the
predicate-bounded query set and equi-joins probes to postings on
``cell``. The recall join is top-k x top-k (metadata-scale). The
rebuild-per-call is the graded fixture's cost, not the operator's —
production search hits an existing index.

Reference parity: none (no ANN surface in the reference — SURVEY.md
§2.12 gap family; LLM-data operators from the build brief).
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from . import _pq_oracle
from .registry import register

#: index geometry — mirrors the batch IVF registrations
_SA_CELLS, _SA_PROBE, _SA_K = 8, 2, 5
#: bootstrap micro-batch (trains the quantizer): vec_id < _SA_TRAIN;
#: the rest arrives as a second batch through the assign-append path
_SA_TRAIN = 200
#: tombstoned ids: vec_id % _SA_DEL_MOD == _SA_DEL_RES (disjoint from
#: the query set below at every sf)
_SA_DEL_MOD, _SA_DEL_RES = 50, 13
#: query set: vec_id < _SA_QUERIES
_SA_QUERIES = 8


def _build_stream_index(
    spark: SparkSession, sf_dir: str, retrain: bool = False
) -> str:
    """Deterministically rebuild the persisted streaming IVF index in a
    scratch dir: bootstrap batch (vec_id < _SA_TRAIN) trains the
    quantizer, a second drain appends the rest, a tombstone delete
    removes the _SA_DEL_* ids, and then either compaction folds the
    tombstones into a fresh generation (default) or ``retrain=True``
    runs the offline-retrain slot — the quantizer re-trains on the
    CURRENT live vectors and every live vector is reassigned into a new
    generation. Content is a pure function of the embeddings table, so
    the search results hash-grade against the SQL replay."""
    from ..streaming.ann_index import (
        ann_index_sink,
        compact_postings,
        delete_vectors,
        retrain_index,
    )

    base = tempfile.mkdtemp(prefix="sgraft_stream_ann_")
    stream_dir = os.path.join(base, "stream")
    index_dir = os.path.join(base, "index")
    ckpt = os.path.join(base, "ckpt")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # Both batch files are written FIRST and drained by ONE availableNow
    # stream with maxFilesPerTrigger=1 — same two micro-batches (same
    # batch ids 0/1, same checkpoint key, so identical segment layout
    # and search results), one streaming-query lifecycle (~1.5 s fixed)
    # instead of two (r15, VERDICT r14 #4). FileStreamSource orders
    # files by modification time, so each batch file's mtime is stamped
    # explicitly (batch 1 is +60 s — far above fs granularity, far
    # inside the source's maxFileAge window): bootstrap/append can never
    # swap on an mtime collision.
    def write_batch(batch_df: DataFrame, ts: float, seen: set) -> set:
        batch_df.coalesce(1).write.mode("append").parquet(stream_dir)
        files = {
            os.path.join(stream_dir, f)
            for f in os.listdir(stream_dir)
            if f.endswith(".parquet")
        }
        for p in files - seen:
            os.utime(p, (ts, ts))
        return files

    t0 = time.time()
    seen = write_batch(emb.where(F.col("vec_id") < _SA_TRAIN), t0, set())
    write_batch(emb.where(F.col("vec_id") >= _SA_TRAIN), t0 + 60.0, seen)
    ann_index_sink(
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir),
        index_dir,
        ckpt,
        n_cells=_SA_CELLS,
    )
    dels = [
        r.vec_id
        for r in emb.where(
            (F.col("vec_id") % _SA_DEL_MOD) == _SA_DEL_RES
        )
        .select("vec_id")
        .collect()  # tombstone id list: n/_SA_DEL_MOD rows — metadata
    ]
    delete_vectors(spark, index_dir, dels, batch_id=0)
    if retrain:
        retrain_index(spark, index_dir, n_cells=_SA_CELLS, iters=2)
    else:
        compact_postings(spark, index_dir)
    return index_dir


def _live_pred():
    return (F.col("vec_id") % _SA_DEL_MOD) != _SA_DEL_RES


def _exact_live_topk_sql() -> str:
    """Brute-force exact top-k over the LIVE (non-tombstoned) vectors —
    the recall denominator. Same shape as the registered brute-force
    oracle with the tombstone predicate applied to candidates."""
    return f"""
    WITH e AS (
      SELECT vec_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_aggregate(list_apply(v, x -> x * x), 'sum')) AS nrm
      FROM e
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_aggregate(list_apply(list_zip(q.v, c.v), x -> x[1] * x[2]), 'sum')
               / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c
        ON q.vec_id < {_SA_QUERIES} AND c.vec_id != q.vec_id
       AND NOT (c.vec_id % {_SA_DEL_MOD} = {_SA_DEL_RES})
    )
    SELECT query_id, neighbor_id
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_SA_K}
    """


def _recall_join_sql(ann: str) -> str:
    return f"""
    WITH exact_tk AS (
      SELECT query_id, neighbor_id FROM ({_exact_live_topk_sql()})
    ), ann_tk AS (
      SELECT query_id, neighbor_id FROM ({ann})
    )
    SELECT e.query_id,
           CAST(count(a.neighbor_id) AS INT) AS n_hits,
           (floor(count(a.neighbor_id) * 1.0 / {_SA_K} * 1000000.0 + 0.5)
            / 1000000.0) AS recall_at_k
    FROM exact_tk e
    LEFT JOIN ann_tk a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    ORDER BY e.query_id
    """


def _stream_recall_oracle() -> str:
    return _recall_join_sql(
        _pq_oracle.ivf_topk_oracle(
            dim=64,
            n_cells=_SA_CELLS,
            n_probe=_SA_PROBE,
            k=_SA_K,
            query_sql=f"vec_id < {_SA_QUERIES}",
            train_sql=f"n.vec_id < {_SA_TRAIN}",
            exclude_sql=f"cand.vec_id % {_SA_DEL_MOD} = {_SA_DEL_RES}",
        )
    )


def _stream_recall_retrained_oracle() -> str:
    """After the retrain slot the quantizer is trained on the LIVE
    (post-delete) vectors and every live vector is reassigned — so the
    replay is the same IVF oracle with training restricted to the live
    set instead of the bootstrap batch."""
    return _recall_join_sql(
        _pq_oracle.ivf_topk_oracle(
            dim=64,
            n_cells=_SA_CELLS,
            n_probe=_SA_PROBE,
            k=_SA_K,
            query_sql=f"vec_id < {_SA_QUERIES}",
            train_sql=f"NOT (n.vec_id % {_SA_DEL_MOD} = {_SA_DEL_RES})",
            exclude_sql=f"cand.vec_id % {_SA_DEL_MOD} = {_SA_DEL_RES}",
        )
    )


@register("stream_ann_index_recall", oracle=_stream_recall_oracle())
def stream_ann_index_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PERSISTED streaming IVF index vs exact brute
    force over the live vectors, per query — the index-lifecycle
    regression monitor (VERDICT r13 #3). The index is rebuilt
    deterministically (bootstrap-train -> append -> delete -> compact;
    see ``_build_stream_index``), searched with
    ``ivf_search_index``, and compared against ``cosine_topk`` over the
    non-tombstoned vectors. A pinned floor lives in
    tests/test_round14_ops.py."""
    return _recall_df(spark, sf_dir, retrain=False)


@register(
    "stream_ann_index_recall_retrained",
    oracle=_stream_recall_retrained_oracle(),
)
def stream_ann_index_recall_retrained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same lifecycle monitor through the RETRAIN slot instead of
    compaction: after the tombstone delete, ``retrain_index`` re-trains
    the quantizer on the live vectors and reassigns them into a new
    generation — search must then equal a fresh-trained batch IVF over
    the live set, which is exactly what the oracle replays. This grades
    the retrain/reassign/publish path (previously pytest-only) with a
    driver hash; since retraining on the full live set can only improve
    cell quality, its recall also upper-bounds the bootstrap-trained
    monitor's on healthy code."""
    return _recall_df(spark, sf_dir, retrain=True)


def _recall_df(spark: SparkSession, sf_dir: str, retrain: bool) -> DataFrame:
    from ..operators.similarity import cosine_topk
    from ..streaming.ann_index import ivf_search_index

    emb = table(spark, sf_dir, "embeddings")
    index_dir = _build_stream_index(spark, sf_dir, retrain=retrain)
    ann = ivf_search_index(
        spark,
        index_dir,
        emb.where(F.col("vec_id") < _SA_QUERIES),
        k=_SA_K,
        n_probe=_SA_PROBE,
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    exact = (
        cosine_topk(
            emb.where(_live_pred()), F.col("vec_id") < _SA_QUERIES, k=_SA_K
        )
        .select("query_id", "neighbor_id")
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("int").alias("n_hits"),
            hround(F.count("hit") / F.lit(_SA_K), 6).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )
