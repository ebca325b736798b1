"""SCD2 merge golden tests — the spec for the semantics the reference
left undefined (dead perform_scd2, SURVEY.md §2.9/§7.4(1))."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.operators.normalize import scd2_stamp
from les_etl_pipeline_spark.operators.scd2 import current_snapshot, scd2_merge

PK = ["AL1", "AL2"]


def _stamp(spark, rows):
    df = spark.createDataFrame(
        rows, "ed_code string, pcd string, AL1 string, AL2 string, AL30 string"
    )
    # checksum over key AND payload so payload changes are detected
    return scd2_stamp(df, PK + ["AL30"])


def test_initial_load(spark):
    t = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "7.25")])
    r = t.collect()[0]
    assert r["iscurrent"] == 1 and r["valid_to"] is None and r["valid_from"] is not None
    assert r["part"] == "d1_20230630"


def test_changed_row_closed_out_and_reinserted(spark):
    old = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "7.25")])
    new = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "9.99")])
    merged = scd2_merge(old, new, PK)
    assert merged.count() == 2
    cur = merged.where(F.col("iscurrent") == 1).collect()
    closed = merged.where(F.col("iscurrent") == 0).collect()
    assert len(cur) == 1 and cur[0]["AL30"] == "9.99"
    assert len(closed) == 1 and closed[0]["AL30"] == "7.25"
    assert closed[0]["valid_to"] is not None


def test_unchanged_row_passthrough(spark):
    old = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "7.25")])
    merged = scd2_merge(old, old, PK)
    assert merged.count() == 1
    assert merged.collect()[0]["iscurrent"] == 1


def test_new_key_inserted(spark):
    old = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "7.25")])
    new = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-2", "1.00")])
    merged = scd2_merge(old, new, PK)
    assert merged.count() == 2
    assert merged.where(F.col("iscurrent") == 1).count() == 2


def test_merge_twice_idempotent(spark):
    """Property: applying the same batch twice == once (SURVEY.md §5.2)."""
    old = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "7.25")])
    new = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "9.99")])
    once = scd2_merge(old, new, PK)
    twice = scd2_merge(once, new, PK)
    assert twice.count() == once.count()
    assert (
        twice.where(F.col("iscurrent") == 1).collect()[0]["AL30"]
        == once.where(F.col("iscurrent") == 1).collect()[0]["AL30"]
    )


def test_current_snapshot_drops_bookkeeping(spark):
    t = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "7.25")])
    snap = current_snapshot(t)
    assert set(snap.columns) == {"ed_code", "pcd", "AL1", "AL2", "AL30", "part"}


def test_null_key_parts_null_safe_checksum(spark):
    """§7.4(3): null-safe checksum keeps identity for rows with null key
    parts (the reference's concat() would null the checksum)."""
    t = _stamp(spark, [("d1", "2023-06-30", None, "pool-1", "7.25")])
    assert t.collect()[0]["checksum"] is not None
    merged = scd2_merge(t, t, PK)  # null-safe key match: no duplicate insert
    assert merged.count() == 1


def test_duplicate_key_in_batch_single_current(spark):
    """A row repeated inside one incoming file (present in real EDW data)
    must not fan out the merge: exactly one iscurrent=1 row per key, and
    the old version is closed exactly once."""
    old = _stamp(spark, [("d1", "2023-06-30", "2023-06-30", "pool-1", "7.25")])
    new = _stamp(
        spark,
        [
            ("d1", "2023-06-30", "2023-06-30", "pool-1", "9.99"),
            ("d1", "2023-06-30", "2023-06-30", "pool-1", "9.99"),
            ("d1", "2023-06-30", "2023-06-30", "pool-1", "8.88"),
        ],
    )
    merged = scd2_merge(old, new, PK)
    cur = merged.where(F.col("iscurrent") == 1).collect()
    closed = merged.where(F.col("iscurrent") == 0).collect()
    assert len(cur) == 1, "one current row per merge key"
    assert len(closed) == 1, "old version closed exactly once"
    assert cur[0]["AL30"] in ("9.99", "8.88")  # deterministic winner
    # winner is stable across runs
    again = scd2_merge(old, new, PK).where(F.col("iscurrent") == 1).collect()
    assert again[0]["AL30"] == cur[0]["AL30"]
