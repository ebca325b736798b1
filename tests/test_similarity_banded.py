"""Bounded-expansion hyperplane-banded cosine pairs (round 13): the
scale guarantee the ml-BRP LSH path lacks, pinned adversarially."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import similarity


def test_candidate_expansion_bounded_on_adversarial_data(spark):
    """Every vector identical — the worst case for ANY bucketing (all
    collide in every table). The sub-bucket valve must hold candidates
    to O(n * max_bucket * num_tables) instead of n^2/2."""
    n, cap, tables = 600, 10, 4
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0) for _ in range(8)]).alias("embedding"),
    )
    cand = similarity.cosine_banded_candidates(
        base, d_in=8, n_bits=4, num_tables=tables, max_bucket=cap
    ).count()
    assert cand <= tables * n * cap, (cand, tables * n * cap)
    # and far below the quadratic form it replaces
    assert cand < n * (n - 1) / 8, cand


def test_banded_pairs_subset_of_exact_with_recall_floor(spark, sf_dir):
    """Precision is exact (every emitted pair passes the true cosine
    threshold — banded pairs are a subset of the exact threshold join);
    recall is the deterministic banding collision rate, pinned >= 0.5
    at the registered parameters (measured 0.63 at sf0.01 round 13)."""
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.threshold_pairs(emb, threshold=0.4).collect()
    }
    banded = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_banded_pairs(emb, threshold=0.4).collect()
    }
    assert banded <= exact
    assert exact, "fixture must have qualifying pairs"
    recall = len(banded) / len(exact)
    assert recall >= 0.5, recall


def test_banded_pairs_deterministic(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    a = sorted(
        map(tuple, similarity.cosine_banded_pairs(emb, threshold=0.4).collect())
    )
    b = sorted(
        map(tuple, similarity.cosine_banded_pairs(emb, threshold=0.4).collect())
    )
    assert a == b and a


def test_banded_candidates_no_cartesian_or_bnlj(spark, sf_dir):
    """The candidate join must stay an equi-join on (t, b, sub) — never
    a nested-loop expansion."""
    emb = table(spark, sf_dir, "embeddings")
    plan = similarity.cosine_banded_pairs(emb, threshold=0.4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_banded_corpus_survivors_superset_of_exact_with_drop_recall(spark, sf_dir):
    """Corpus-level parity vs the exact tier (VERDICT r13 #1): banded
    pairs are a subset of exact pairs, so banded components sub-partition
    exact components — every exact survivor survives banded dedup, and
    the docs banded drops are a subset of the exact drops, with drop
    recall pinned >= 0.5 at the registered parameters."""
    from les_etl_pipeline_spark.operators import dedup

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    banded = {
        r.doc_id
        for r in dedup.embedding_cosine_dedup(docs, emb, threshold=0.4).collect()
    }
    exact = {
        r.doc_id
        for r in dedup.embedding_cosine_dedup(
            docs, emb, threshold=0.4, method="exact"
        ).collect()
    }
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert exact <= banded <= all_ids
    exact_drops, banded_drops = all_ids - exact, all_ids - banded
    assert banded_drops <= exact_drops
    assert exact_drops, "fixture must have semantic duplicates"
    recall = len(banded_drops) / len(exact_drops)
    assert recall >= 0.5, recall
