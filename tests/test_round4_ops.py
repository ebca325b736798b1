"""Operator-level tests for the round-4 additions: repetition features,
deterministic MinHash signatures, and byte-window chunking."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.operators import dedup, multimodal
from les_etl_pipeline_spark.operators.text import repetition_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_features_values(spark):
    df = _docs(
        spark,
        [
            (1, "a a a b"),          # top token 'a' 3/4; top bigram 'a a' 2/3
            (2, "x"),                # single token: no bigrams -> share 0
            (3, "p q r s"),          # all unique: shares 1/4 and 1/3
        ],
    )
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert out[1]["n_tokens"] == 4
    assert abs(out[1]["top_token_share"] - 3 / 4) < 1e-9
    assert abs(out[1]["top_bigram_share"] - 2 / 3) < 1e-9
    assert out[2]["n_tokens"] == 1
    assert out[2]["top_bigram_share"] == 0.0
    assert abs(out[3]["top_token_share"] - 1 / 4) < 1e-9


def test_minhash_det_signature_properties(spark):
    df = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),   # identical -> same signature
            (3, "a completely different doc here"),
            (4, "too short"),                   # < 3 words -> excluded
        ],
    )
    out = {r["doc_id"]: r["minhash_sig"] for r in dedup.minhash_det_signature(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] == out[2]
    assert out[1] != out[3]
    # k=4 minima of md5 hex, ':'-joined, sorted ascending
    parts = out[1].split(":")
    assert len(parts) <= 4 and parts == sorted(parts)
    assert all(len(p) == 32 for p in parts)


def test_byte_chunks_reassemble(spark):
    df = _docs(spark, [(1, "abcdefghij" * 10), (2, "xy")])  # 100 and 2 bytes
    assets = multimodal.to_asset_table(df)
    out = multimodal.byte_chunks(assets, chunk_size=32).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 bytes -> chunks of 32/32/32/4 at offsets 0/32/64/96
    sizes = [r["n_bytes"] for r in by_doc[1]]
    offs = [r["offset"] for r in by_doc[1]]
    assert sizes == [32, 32, 32, 4]
    assert offs == [0, 32, 64, 96]
    # hex chunks reassemble to the original payload
    joined = bytes.fromhex("".join(r["chunk_hex"] for r in by_doc[1]))
    assert joined == b"abcdefghij" * 10
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_bytes"] == 2


def test_pagerank_properties(spark):
    """Fixed-iteration PageRank: ranks sum to ~1 on a symmetric graph
    (no dangling mass), high-degree hubs outrank leaves, deterministic
    across runs."""
    from les_etl_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (4, 5)], "src long, dst long"
    )
    r1 = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    assert abs(sum(r1.values()) - 1.0) < 1e-9
    assert r1[1] == max(r1.values())          # hub (degree 3)
    assert r1[5] < r1[4]                      # leaf below its hub
    r2 = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    assert r1 == r2


def test_pagerank_directed_sinks(spark):
    """symmetric=False: sink nodes (appearing only as dst) must be in
    the vertex set, receive rank, and the dangling-mass redistribution
    must keep the ranks summing to 1."""
    from les_etl_pipeline_spark.operators.graph import pagerank

    # 3 is a pure sink; 4 -> 5 -> 4 is a cycle feeding nothing.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 4)], "src long, dst long"
    )
    r = {
        row["node"]: row["rank"]
        for row in pagerank(edges, iterations=4, symmetric=False).collect()
    }
    assert set(r) == {1, 2, 3, 4, 5}          # sink 3 present
    assert abs(sum(r.values()) - 1.0) < 1e-9  # dangling mass redistributed
    assert r[3] > r[2] > r[1]                 # rank flows downstream


def test_choose_lsh_params_s_curve():
    """(b, r) chooser: the S-curve threshold (1/b)^(1/r) of the chosen
    banding must be the closest achievable to the target, and known
    exact points must be hit ((1/16)^(1/4) = 0.5 at n=64)."""
    from les_etl_pipeline_spark.operators.dedup import choose_lsh_params

    assert choose_lsh_params(0.5, 64) == (16, 4)
    for thr in (0.2, 0.5, 0.8, 0.9):
        b, r = choose_lsh_params(thr, 64)
        assert b * r <= 64
        t = (1.0 / b) ** (1.0 / r)
        # every candidate banding's curve point is at least this far off
        best = min(
            abs((1.0 / (64 // rr)) ** (1.0 / rr) - thr) for rr in range(1, 65)
        )
        assert abs(t - thr) == best
    # higher threshold -> more rows per band (steeper AND filtering)
    assert choose_lsh_params(0.9, 64)[1] > choose_lsh_params(0.3, 64)[1]
    try:
        choose_lsh_params(1.5, 64)
    except ValueError:
        pass
    else:
        raise AssertionError("threshold outside (0,1) must raise")


def test_minhash_banded_recall_beats_naive(spark, sf_dir):
    """The self-tuned banding's candidate set must recover more of the
    true Jaccard>=0.5 pairs than the naive single-band setting (b=1,
    r=n — essentially exact-signature match only) on the test corpus."""
    from les_etl_pipeline_spark.operators import dedup
    from les_etl_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    truth = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, max_shingle_freq=None
        ).collect()
    }
    assert truth, "fixture corpus must contain true near-duplicate pairs"

    tuned = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_banded_pairs(docs, threshold=0.5).collect()
    }
    # naive banding: one band of all 64 rows -> AND over everything
    sigs = dedup.minhash_signature_array(docs)
    from pyspark.sql import functions as F

    naive = {
        (r["id_a"], r["id_b"])
        for r in sigs.groupBy("minhash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .select(
            F.col("ids")[0].alias("id_a"), F.explode(F.slice("ids", 2, 10000)).alias("id_b")
        )
        .collect()
    }
    recall_tuned = len(truth & tuned) / len(truth)
    recall_naive = len(truth & naive) / len(truth)
    assert recall_tuned > recall_naive
    assert recall_tuned >= 0.8, (recall_tuned, recall_naive)
