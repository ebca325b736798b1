"""Write-audit-publish snapshot store: atomic pointer flip, failed-audit
rollback, time travel, vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from les_etl_pipeline_spark.sinks.snapshot_store import SnapshotStore


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "tbl"))


def test_publish_read_roundtrip(spark, store):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    v = store.publish(df)
    assert v == 0
    got = store.read()
    assert sorted(tuple(r) for r in got.collect()) == [(i, 2 * i) for i in range(10)]


def test_versions_advance_and_time_travel(spark, store):
    store.publish(spark.range(3))
    store.publish(spark.range(5))
    assert store.current_version() == 1
    assert store.read(0).count() == 3
    assert store.read().count() == 5


def test_failed_audit_leaves_store_untouched(spark, store):
    store.publish(spark.range(4))
    with pytest.raises(ValueError, match="audit rejected"):
        store.publish(spark.range(2), audit=lambda df: df.count() >= 4)
    # current still v0 with the old data
    assert store.current_version() == 0
    assert store.read().count() == 4
    # the rejected dir is deleted on the spot — no orphan accumulation
    assert not os.path.isdir(os.path.join(store.root, "v=1"))
    # next good publish lands cleanly and is readable
    v = store.publish(spark.range(7), audit=lambda df: df.count() == 7)
    assert v > 0 and store.read().count() == 7


def test_pointer_flip_is_all_or_nothing(spark, store):
    store.publish(spark.range(3))
    ptr = os.path.join(store.root, "_CURRENT")
    with open(ptr) as f:
        meta = json.load(f)
    assert meta["version"] == 0
    # no temp pointer litter after publish
    assert not [n for n in os.listdir(store.root) if n.startswith("._current")]


def test_vacuum_keeps_current_and_recent(spark, store):
    for n in (2, 3, 4, 5):
        store.publish(spark.range(n))
    dropped = store.vacuum(keep_last=2)
    assert dropped == [0, 1]
    assert store.read().count() == 5
    assert store.read(2).count() == 4
    with pytest.raises(Exception):
        store.read(0).count()


def test_partitioned_snapshot(spark, store):
    df = spark.range(20).withColumn("part", (F.col("id") % 4).cast("string"))
    store.publish(df, partition_by="part")
    snap = os.path.join(store.root, "v=0")
    assert any(n.startswith("part=") for n in os.listdir(snap))
    assert store.read().count() == 20
