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
