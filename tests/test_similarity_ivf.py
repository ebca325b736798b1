"""IVF ANN: recall against brute force + probe-bound candidate sets."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import similarity


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(
            emb, F.col("vec_id") < 10, k=5, n_cells=8, n_probe=4
        ).collect()
    }
    # recall@5 with half the cells probed: random 64-dim data is hard for
    # IVF, but a healthy implementation still recovers a solid fraction
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall
    # every query returns exactly k results (cells are non-degenerate)
    per_q = {}
    for q, n in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(v == 5 for v in per_q.values())


def test_ivf_deterministic(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, similarity.ivf_topk(emb, F.col("vec_id") < 5, k=3).collect()))
    b = sorted(map(tuple, similarity.ivf_topk(emb, F.col("vec_id") < 5, k=3).collect()))
    assert a == b
