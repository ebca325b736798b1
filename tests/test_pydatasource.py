"""Spark 4 Python DataSource API: synthdocs generating reader and
jsonl_shards two-phase writer."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from les_etl_pipeline_spark.sources import pydatasource


def _registered(spark):
    pydatasource.register_all(spark)
    return spark


def test_synthdocs_deterministic_and_partition_parallel(spark):
    _registered(spark)
    a = spark.read.format("synthdocs").option("n_docs", 500).option("n_partitions", 8).load()
    b = spark.read.format("synthdocs").option("n_docs", 500).option("n_partitions", 3).load()
    assert a.count() == 500
    assert a.rdd.getNumPartitions() == 8
    # pure function of doc_id: partitioning must not change content
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    assert all(r[4] == len(r[1]) for r in ra)  # n_chars consistent
    langs = {r[2] for r in ra}
    assert langs <= {"en", "es", "de", "fr", "it"} and len(langs) > 1


def test_synthdocs_feeds_existing_operators(spark):
    _registered(spark)
    docs = spark.read.format("synthdocs").option("n_docs", 300).load()
    from les_etl_pipeline_spark.operators import dedup

    sizes = (
        docs.select("doc_id", F.explode(dedup.shingles("text", 3)).alias("s"))
        .groupBy("doc_id")
        .count()
    )
    assert sizes.count() > 0


def test_jsonl_shards_write_manifest_roundtrip(spark, tmp_path):
    _registered(spark)
    out = str(tmp_path / "shards")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("k")
    ).repartition(4)
    df.write.format("jsonl_shards").option("path", out).mode("append").save()
    with open(os.path.join(out, "_MANIFEST")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 100
    assert len(manifest["shards"]) == 4
    # every listed shard exists; read-back through the manifest matches
    for s in manifest["shards"]:
        assert os.path.exists(os.path.join(out, s))
    back = pydatasource.read_manifest_shards(spark, out)
    assert back.count() == 100
    assert sorted(r["id"] for r in back.collect()) == list(range(100))


def test_synthevents_stream_exactly_once_bounded(spark, tmp_path):
    """availableNow drains the bounded synthetic stream through the
    micro-batch engine: every event id arrives exactly once, and a
    second run from a fresh checkpoint reproduces identical rows
    (deterministic replay)."""
    _registered(spark)

    def run(name: str):
        q = (
            spark.readStream.format("synthevents")
            .option("rows_per_batch", 30)
            .option("n_total", 100)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / name))
            .start()
        )
        # bounded source: exhausts at n_total, so processAllAvailable
        # terminates (availableNow would stop after the first prefetched
        # increment with the simple stream reader)
        q.processAllAvailable()
        q.stop()
        return sorted(tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect())

    first = run("se_a")
    assert len(first) == 100
    assert [r[0] for r in first] == list(range(100))
    assert first == run("se_b")


def test_synthevents_windowed_agg(spark, tmp_path):
    """The custom stream composes with watermarked windowed aggregation
    — the standard §2.10 operators run unchanged on a Python source."""
    _registered(spark)
    events = (
        spark.readStream.format("synthevents")
        .option("rows_per_batch", 40)
        .option("n_total", 120)
        .load()
    )
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("se_w")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "se_w"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM se_w").collect()
    total = sum(r["count"] for r in rows)
    assert 0 < total <= 120  # closed windows only (append mode)
