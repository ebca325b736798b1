"""Product-quantization ANN: recall against brute force, result-set
shape, and determinism of the code assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import similarity


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    }
    adc_only = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(
            emb, F.col("vec_id") < 10, k=5, m=8, n_codes=16
        ).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(
            emb, F.col("vec_id") < 10, k=5, m=8, n_codes=16, rerank=50
        ).collect()
    }
    # random near-orthogonal 64-dim data is the hard case for a coarse
    # quantizer: ADC alone lands a modest fraction, the exact re-rank of
    # the 10% short-list recovers most of the exact top-5
    recall_adc = len(exact & adc_only) / len(exact)
    recall = len(exact & approx) / len(exact)
    assert recall_adc >= 0.15, recall_adc
    assert recall >= 0.5, recall
    assert recall >= recall_adc
    per_q = {}
    for q, _n in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(v == 5 for v in per_q.values())


def test_pq_deterministic(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, similarity.pq_topk(emb, F.col("vec_id") < 5, k=3).collect()))
    b = sorted(map(tuple, similarity.pq_topk(emb, F.col("vec_id") < 5, k=3).collect()))
    assert a == b


def test_pq_adist_nonnegative_and_ranked(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    rows = similarity.pq_topk(emb, F.col("vec_id") < 3, k=4).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["adist"] >= 0.0
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adist"]))
    for pairs in by_q.values():
        pairs.sort()
        dists = [d for _r, d in pairs]
        assert dists == sorted(dists)  # rank order == distance order


def test_ivf_pq_recall_and_probe_restriction(spark, sf_dir):
    """The composed index: recall above the coarse-quantizer floor, and
    determinism across runs (seeded k-means at both levels)."""
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    }
    a = similarity.ivf_pq_topk(
        emb, F.col("vec_id") < 10, k=5, n_cells=8, n_probe=4, m=8, n_codes=16, rerank=50
    ).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in a}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall
    b = similarity.ivf_pq_topk(
        emb, F.col("vec_id") < 10, k=5, n_cells=8, n_probe=4, m=8, n_codes=16, rerank=50
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_registered_recall_query_floor_and_bounds(spark, sf_dir):
    """The REGISTERED recall monitor (similarity_ivf_pq_recall): mean
    recall@5 over the query set stays above the pinned floor (0.55 at
    sf0.01; measured 0.70 in round 13), every per-query value is a
    legal n_hits/5 in [0, 1], and n_hits is consistent with recall."""
    from les_etl_pipeline_spark.queries import QUERIES

    rows = QUERIES["similarity_ivf_pq_recall"](spark, sf_dir).collect()
    assert len(rows) == 8  # one row per query vector (vec_id < 8)
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall_at_k - r.n_hits / 5) < 1e-9
    mean = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean >= 0.55, mean
