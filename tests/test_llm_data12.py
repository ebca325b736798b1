"""Round-8 pack 12: duplicated-span dedup (Lee et al. 2022 style) and
Johnson-Lindenstrauss random projection."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import dedup, similarity


def test_duplicated_spans_crafted_fixture(spark):
    """Hand-checkable corpus with gram_len=5:

    - doc 1/2 share the 12-char block 'ABCDEFGHIJKL' -> every position
      of that block is duplicated, one maximal span of 12 chars each.
    - doc 3 contains 'XXXXXXXXXX' (10 chars): its 5-grams repeat
      WITHIN the doc (positions 4..9 all 'XXXXX'), so within-doc
      repetition alone must mark one 10-char span.
    - doc 4 is all-unique -> absent from the output.
    """
    docs = spark.createDataFrame(
        [
            (1, "ABCDEFGHIJKLmnopq"),
            (2, "zzABCDEFGHIJKLyy"),
            (3, "abcXXXXXXXXXXdef"),
            (4, "0123456789uvwxyz"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.n_spans, r.dup_chars)
        for r in dedup.duplicated_spans(docs, gram_len=5).collect()
    }
    assert out == {1: (1, 12), 2: (1, 12), 3: (1, 10)}


def test_duplicated_spans_bounds(spark, sf_dir):
    """dup_chars never exceeds doc length; every span holds >= gram_len
    chars, so dup_chars >= gram_len * n_spans is impossible to violate."""
    docs = table(spark, sf_dir, "documents")
    rows = dedup.duplicated_spans(docs, gram_len=20).collect()
    assert rows
    lens = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    for r in rows:
        assert 0 < r.dup_chars <= lens[r.doc_id]
        assert r.dup_chars >= 20 * r.n_spans
        assert abs(r.dup_frac - r.dup_chars / lens[r.doc_id]) < 1e-9


def test_random_projection_preserves_coarse_recall(spark, sf_dir):
    """The JL promise, pinned at the granularity 16 dims can deliver:
    with mean cosine distortion ~1/sqrt(d_out) ~= 0.25, exact top-5
    recall is not preserved (the fixture's neighbor gaps are ~0.05),
    but CANDIDATE GENERATION is — the projected top-5 must land inside
    the exact top-50 far above the random rate (measured 0.54 on the
    fixture vs 50/499 ~= 0.10 random; floor 0.30). This is exactly how
    the projection is used at scale: cheap shortlist, exact re-rank."""
    emb = table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 10
    top50 = {}
    for r in similarity.cosine_topk(emb, pred, k=50).collect():
        top50.setdefault(r.query_id, set()).add(r.neighbor_id)
    proj = similarity.random_project(emb, d_in=64, d_out=16)
    p5 = {}
    for r in similarity.cosine_topk(proj, pred, k=5).collect():
        p5.setdefault(r.query_id, set()).add(r.neighbor_id)
    hit = sum(len(p5[q] & top50[q]) for q in p5) / (5 * len(p5))
    assert hit >= 0.30, hit


def test_random_projection_distortion_scales_like_jl(spark, sf_dir):
    """Mean |cos_projected - cos_exact| over sampled pairs must (a) sit
    near the JL 1/sqrt(d_out) rate at 16 dims (broken sign matrices --
    constant rows, wrong zip axis -- land far above it) and (b) SHRINK
    when d_out doubles, which pins the matrix actually varying with j.
    Driver-side numpy on 80 collected fixture vectors: this is a
    property check of the matrix, not a distributed path."""
    import itertools

    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").where(F.col("vec_id") < 80).collect()
    V = {r.vec_id: np.array(r.embedding, dtype=float) for r in rows}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    def mean_err(d_out):
        S = np.array(similarity.rp_sign_matrix(64, d_out))
        P = {i: S @ v / np.sqrt(d_out) for i, v in V.items()}
        return np.mean(
            [abs(cos(P[a], P[b]) - cos(V[a], V[b]))
             for a, b in itertools.combinations(sorted(V), 2)]
        )
    e16, e32 = mean_err(16), mean_err(32)
    assert e16 < 0.30, e16
    assert e32 < e16, (e32, e16)


def test_random_projection_is_narrow_and_seeded(spark, sf_dir):
    """No shuffle in the projection itself (narrow map), and the sign
    matrix is a pure function of the seed string."""
    emb = table(spark, sf_dir, "embeddings")
    plan = (
        similarity.random_project(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    m1 = similarity.rp_sign_matrix(8, 4)
    m2 = similarity.rp_sign_matrix(8, 4)
    m3 = similarity.rp_sign_matrix(8, 4, seed="other:")
    assert m1 == m2 and m1 != m3
    assert all(s in (1.0, -1.0) for row in m1 for s in row)


def test_random_projection_rejects_wrong_dimension(spark, sf_dir):
    """A d_in that doesn't match the vectors must FAIL LOUDLY (executor-
    side raise_error), not emit silently-null projections via zip_with's
    null padding (ADVICE r8)."""
    import pytest

    emb = table(spark, sf_dir, "embeddings").limit(5)
    with pytest.raises(Exception, match="expected d_in=32"):
        similarity.random_project(emb, d_in=32, d_out=8).collect()


def test_rh_lsh_topk_rejects_wrong_dimension(spark, sf_dir):
    """Same fail-loud contract for the LSH tier (ADVICE r9): a
    mismatched vector must raise, not silently hash to bucket 0 of
    every table through zip_with null padding."""
    import pytest

    emb = table(spark, sf_dir, "embeddings").limit(8)
    with pytest.raises(Exception, match="expected d_in=32"):
        similarity.rh_lsh_topk(
            emb, F.col("vec_id") >= 0, k=3, d_in=32, n_bits=4, num_tables=2
        ).collect()


def test_mmr_rerank_large_k_stays_linear_and_correct(spark, sf_dir):
    """k=12 greedy unrolling: each step is checkpointed, so later steps
    read materialized one-row-per-query tables instead of re-inlining the
    whole pyramid (ADVICE r8 — plans grew exponentially in k). Correctness
    re-pinned against the independent numpy greedy at the larger k."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    got = {}
    for r in similarity.mmr_rerank(
        emb, F.col("vec_id") < 4, k=12, n_cand=20, lam=0.7
    ).collect():
        got.setdefault(r.query_id, []).append((r.step, r.selected_id))
    rows = emb.select("vec_id", "embedding").collect()
    V = {r.vec_id: np.array(r.embedding, dtype=float) for r in rows}
    U = {i: v / np.linalg.norm(v) for i, v in V.items()}
    lam, mu = 0.7, 1.0 - 0.7
    for q in range(4):
        rel = {c: float(U[q] @ U[c]) for c in U if c != q}
        shortlist = sorted(rel, key=lambda c: (-rel[c], c))[:20]
        sel = []
        for _ in range(12):
            best = None
            for c in shortlist:
                if c in sel:
                    continue
                score = lam * rel[c] - mu * max(
                    (float(U[c] @ U[s]) for s in sel), default=0.0
                ) if sel else lam * rel[c]
                if best is None or score > best[0] or (score == best[0] and c < best[1]):
                    best = (score, c)
            sel.append(best[1])
        assert [c for _, c in sorted(got[q])] == sel, q


def test_rh_lsh_topk_finds_planted_near_duplicates(spark, sf_dir):
    """The deterministic random-hyperplane LSH must do LSH's actual job:
    retrieve HIGH-similarity neighbors. The fixture embeddings are
    near-orthogonal (no pair above cos 0.7), so plant a scaled+shifted
    twin of each vector (cos ~ 1) and require the twin to surface as the
    rank-1 neighbor for >= 90% of queries. (Charikar bound: p_bit ~ 1 -
    acos(cos)/pi ~ 0.99 for twins, so 6-bit/3-table recall ~ 0.9998 —
    90% is a safe floor for fixture noise.)"""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.where(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") * 1.01 + 0.0005
        ).alias("embedding"),
    )
    corpus = emb.unionByName(twins)
    got = similarity.rh_lsh_topk(
        corpus, F.col("vec_id") >= 10000, k=1, n_bits=6, num_tables=3
    ).collect()
    hits = sum(1 for r in got if r.neighbor_id == r.query_id - 10000)
    assert hits >= 90, (hits, len(got))


def test_rh_lsh_topk_plan_is_bucketed(spark, sf_dir):
    """Candidate generation must be an equi-join on (table, bucket) with
    the query side broadcast — no nested-loop/cartesian candidate path."""
    emb = table(spark, sf_dir, "embeddings")
    plan = (
        similarity.rh_lsh_topk(emb, F.col("vec_id") < 10, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mmr_rerank_matches_numpy_greedy(spark, sf_dir):
    """Independent driver-side reimplementation of greedy MMR (numpy,
    no shared code with the operator) must agree on the selection
    sequence for every fixture query."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    got = {}
    for r in similarity.mmr_rerank(
        emb, F.col("vec_id") < 10, k=5, n_cand=20, lam=0.7
    ).collect():
        got.setdefault(r.query_id, []).append((r.step, r.selected_id))
    rows = emb.select("vec_id", "embedding").collect()
    V = {r.vec_id: np.array(r.embedding, dtype=float) for r in rows}
    U = {i: v / np.linalg.norm(v) for i, v in V.items()}
    lam, mu = 0.7, 1.0 - 0.7
    for q in range(10):
        rel = {c: float(U[q] @ U[c]) for c in U if c != q}
        shortlist = sorted(rel, key=lambda c: (-rel[c], c))[:20]
        sel = []
        for _ in range(5):
            best = None
            for c in shortlist:
                if c in sel:
                    continue
                score = lam * rel[c] - mu * max(
                    (float(U[c] @ U[s]) for s in sel), default=0.0
                ) if sel else lam * rel[c]
                if best is None or score > best[0] or (score == best[0] and c < best[1]):
                    best = (score, c)
            sel.append(best[1])
        assert [c for _, c in sorted(got[q])] == sel, q


def test_compression_ratio_signal(spark, sf_dir):
    """Distributed zlib ratios must equal driver-side zlib exactly, and
    the signal must order as the heuristic promises: templated repetition
    compresses far below prose, random hex far above it."""
    import zlib

    from les_etl_pipeline_spark.operators import text as text_ops

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    got = {r.doc_id: (r.raw_bytes, r.gz_bytes) for r in
           text_ops.compression_ratio(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        b = r.text.encode("utf-8")
        assert got[r.doc_id] == (len(b), len(zlib.compress(b, 6))), r.doc_id

    crafted = spark.createDataFrame(
        [
            (1, "lorem ipsum " * 200),
            (2, "".join(f"{i * 2654435761 % 2**32:08x}" for i in range(300))),
        ],
        "doc_id bigint, text string",
    )
    ratios = {r.doc_id: r.ratio for r in
              text_ops.compression_ratio(crafted).collect()}
    assert ratios[1] < 0.1 < 0.5 < ratios[2]
