"""Deterministic sampling/splitting (operators/sampling.py) and token
chunking (operators/text.token_chunks) properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from les_etl_pipeline_spark.operators.sampling import (
    hash_split,
    stratified_hash_sample,
)
from les_etl_pipeline_spark.operators.text import token_chunks


def test_hash_split_covers_all_rows_and_is_stable(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: same assignment on recompute and under repartitioning
    again = hash_split(df.repartition(13), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_hash_split_stable_under_appends(spark):
    """Rows keep their split when new rows arrive (content-keyed hash)."""
    base = spark.range(500).withColumnRenamed("id", "k")
    grown = spark.range(1000).withColumnRenamed("id", "k")
    fr = {"train": 0.9, "val": 0.1}
    before = {r["k"]: r["split"] for r in hash_split(base, "k", fr).collect()}
    after = {r["k"]: r["split"] for r in hash_split(grown, "k", fr).collect()}
    assert all(after[k] == v for k, v in before.items())


def test_hash_split_rejects_bad_fractions(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_split(df, "k", {"a": 0.9, "b": 0.3})


def test_weighted_sample_rejects_nonpositive_weights(spark):
    """A-Res precondition w > 0: zero/negative/null-weight rows must be
    excluded from the draw, not crash (ANSI divide-by-zero) or invert
    the ordering."""
    from les_etl_pipeline_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [("a", 10.0), ("b", 0.0), ("c", -3.0), ("d", None), ("e", 5.0)],
        "k string, w double",
    )
    rows = weighted_sample_topk(df, "k", "w", k=10).collect()
    assert {r["k"] for r in rows} == {"a", "e"}


def test_stratified_sample_drops_unlisted_strata(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(1000)], "k long, lang string"
    )
    out = stratified_hash_sample(df, "k", "lang", {"en": 0.5})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n = out.count()
    assert 150 < n < 350  # ~250 of 500 en rows


def test_token_chunks_cover_document_exactly(spark):
    df = spark.createDataFrame([("w0 w1 w2 w3 w4 w5 w6",)], "text string")
    out = df.select(F.explode(token_chunks("text", chunk_size=3)).alias("c")).select(
        "c.chunk_idx", "c.chunk_text", "c.n_tokens"
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(0, "w0 w1 w2", 3), (1, "w3 w4 w5", 3), (2, "w6", 1)]


def test_token_chunks_overlapping_stride(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    out = df.select(F.explode(token_chunks("text", chunk_size=4, stride=2)).alias("c"))
    texts = [r["c"]["chunk_text"] for r in out.collect()]
    assert texts == ["a b c d", "c d e", "e"]


def test_pack_chunks_properties(spark):
    """In-order fill: no tokens lost, sequences fill to capacity before a
    new one opens, assignment stable under repartitioning."""
    from les_etl_pipeline_spark.operators.packing import pack_chunks, packing_stats

    rows = [("s", i, (i * 37) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "shard string, idx int, n_tokens int")
    packed = pack_chunks(df, capacity=100, shard_col="shard", order_cols=["idx"])
    total = df.agg(F.sum("n_tokens")).collect()[0][0]
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == total
    seqs = (
        packed.groupBy("seq_idx")
        .agg(F.sum("n_tokens").alias("n"))
        .orderBy("seq_idx")
        .collect()
    )
    # every sequence except the last holds >= capacity - (max chunk - 1)
    # tokens (first-fit can overflow by at most one chunk's worth)
    for r in seqs[:-1]:
        assert r["n"] >= 100 - 49
    stats = packing_stats(packed, capacity=100, shard_col="shard").collect()[0]
    assert stats["n_seqs"] == len(seqs)
    again = pack_chunks(
        df.repartition(7), capacity=100, shard_col="shard", order_cols=["idx"]
    )
    assert packed.exceptAll(again).count() == 0
