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

Per micro-batch cost is O(batch x n_cells) scalar arithmetic + one
append — no shuffle at all (the argmin is a projection), no index
rewrite, never a corpus rescan. ``ivf_search_index`` replays the exact
probe-and-score shape of ``similarity.ivf_topk`` (rounded probe
distance ranked with cell tie-break, raw-double cosine, rank window
tie-broken on neighbor id), which is what lets the parity test pin
index-search == ``ivf_topk`` bit-for-bit when both see the same
vectors and centroids.
"""

from __future__ import annotations

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


def _index_root(spark, index_dir: str) -> str:
    """Resolve the index's LIVE generation. A retrained index keeps its
    state under ``index_dir/state/v=<n>/{centroids,postings}`` (a
    SnapshotStore — the retrain swap is one atomic version claim); an
    index that has never been retrained uses the flat bootstrap layout
    directly under ``index_dir``. Sink, search, delete and compaction
    all resolve through here, so a retrain redirects every consumer at
    its next operation. The ledger (stream identity) stays at
    ``index_dir/_ledger`` — it tracks the STREAM's progress, which is
    generation-independent."""
    from ..sinks.snapshot_store import SnapshotStore

    state = os.path.join(index_dir, "state")
    if os.path.isdir(state):
        store = SnapshotStore(spark, state)
        v = store.current_version()
        if v is not None:
            return store.version_path(v)
    return index_dir


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
    import json

    with open(os.path.join(centroids_path, _STATS), "w") as f:
        json.dump({"trained_mean_d2": float(trained_mean_d2)}, f)


def _read_stats(centroids_path: str) -> dict:
    import json

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

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # exactly-once: per-checkpoint HWM ledger (a new stream's batch 0
        # into an existing index is real work, not a replay)
        if xo.committed(index_dir, key, batch_id):
            return
        # resolve the live generation PER BATCH: a retrain between
        # batches atomically redirects the ingest to the new quantizer
        root = _index_root(spark, index_dir)
        centroids_path = os.path.join(root, "centroids")
        postings_path = os.path.join(root, "postings")
        # repair a crashed compaction swap before reading/writing postings
        xo.recover_swap(postings_path)
        xo.clear_segments([postings_path], key, batch_id)
        e = _doubles(batch_df, id_col, vec_col)
        # a write-complete marker gates the bootstrap: a crash mid-
        # centroid-write leaves no marker, and the replay retrains
        # (deterministic Lloyd on the same batch => identical centroids)
        # and overwrites; bare exists() would trust a torn write
        if not xo.is_complete(centroids_path):
            # bootstrap: train the coarse quantizer on this batch only —
            # the offline-retrain slot is retrain_index(); k x d scalars
            _, cents = kmeans_lloyd_full(e, k=n_cells, iters=2, vec_col="v")
            spark.createDataFrame(
                [(c, v) for c, v in sorted(cents.items())], CENTROIDS_SCHEMA
            ).write.mode("overwrite").parquet(centroids_path)
            _write_stats(
                centroids_path,
                _assign(e, cents).agg(F.avg("d")).collect()[0][0],
            )
            xo.mark_complete(centroids_path)
        else:
            cents = _load_centroids(spark, centroids_path)
        assigned = _assign(e, cents)
        nrm = F.sqrt(
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        assigned.select(
            "vec_id",
            F.col("cluster").cast("int").alias("cell"),
            "v",
            nrm.alias("nrm"),
            F.lit(batch_id).cast("bigint").alias("batch"),
        ).write.mode("overwrite").parquet(
            xo.segment(postings_path, key, batch_id)
        )
        xo.commit(index_dir, key, batch_id)

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
    ``vec_ids`` may be a list or a 1-column DataFrame."""
    tomb_path = os.path.join(_index_root(spark, index_dir), "tombstones")
    if isinstance(vec_ids, DataFrame):
        df = vec_ids.select(F.col(vec_ids.columns[0]).cast("bigint").alias("vec_id"))
    else:
        df = spark.createDataFrame([(int(v),) for v in vec_ids], "vec_id bigint")
    df.select(
        "vec_id", F.lit(batch_id).cast("bigint").alias("batch")
    ).write.mode("append").parquet(tomb_path)


def _live_postings(spark, index_dir: str) -> DataFrame:
    """Postings minus tombstones (one broadcast-able anti-join — the
    tombstone set is small between compactions by construction)."""
    root = _index_root(spark, index_dir)
    postings = xo.read_table(
        spark, os.path.join(root, "postings"), POSTINGS_SCHEMA
    )
    tomb_path = os.path.join(root, "tombstones")
    if not os.path.exists(tomb_path):
        return postings
    tomb = spark.read.schema(TOMBSTONES_SCHEMA).parquet(tomb_path)
    return postings.join(
        F.broadcast(tomb.select("vec_id").distinct()), "vec_id", "left_anti"
    )


def compact_postings(spark, index_dir: str, partitions_per_cell: int = 1) -> int:
    """Fold tombstones into the postings and rewrite the inverted file
    CLUSTERED BY cell — hash-repartitioned on ``cell`` and sorted within
    each file, so a probe's ``cell IN (...)`` filter prunes at parquet
    row-group statistics. ``cell`` stays a data column (NOT a partition
    directory): per-batch segment subdirs and compacted files then share
    one uniform layout and every reader is a single recursive parquet
    scan — mixing partitioned and flat writes under one root is what
    broke partition discovery (ADVICE r8). On a real cluster this same
    pass writes a bucketed-by-``cell`` table for pruned bucket reads.
    Returns the number of live rows written.

    Staging-rewrite-then-swap (the ``sinks/layout.compact_parquet``
    idiom): the live rows land in ``postings.staging``, then one
    atomic-enough rename swap — readers never see a half-written index.
    At 100 TB this runs as the periodic maintenance job that also
    merges small append segments (every micro-batch appended one) into
    ``partitions_per_cell`` files per cell."""
    root = _index_root(spark, index_dir)
    postings_path = os.path.join(root, "postings")
    # repair any half-finished previous swap, then sweep abandoned-crash
    # segment debris (single-writer contract: compaction never runs
    # concurrently with an active drain)
    xo.recover_swap(postings_path)
    xo.drop_uncommitted_segments(index_dir, [postings_path])
    live = _live_postings(spark, index_dir)
    staging = postings_path + ".staging"
    backup = postings_path + ".old"
    (
        live.repartition(partitions_per_cell * 8, "cell")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(staging)
    )
    n = spark.read.schema(POSTINGS_SCHEMA).parquet(staging).count()
    import shutil

    os.rename(postings_path, backup)
    os.rename(staging, postings_path)
    shutil.rmtree(backup)
    tomb_path = os.path.join(root, "tombstones")
    if os.path.exists(tomb_path):
        shutil.rmtree(tomb_path)
    return n


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
        _assign(_live_postings(spark, index_dir).select("vec_id", "v"), cents)
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
    atomic generation via ``SnapshotStore.publish_dir`` — the version
    claim is a single rename, so sink/search/compact consumers resolve
    either the old generation or the new one, never a mix. Tombstones
    fold in (retraining reads live postings only); the stream ledger is
    untouched (stream progress is generation-independent). Runs as a
    maintenance job, never concurrently with a drain (same single-
    maintenance-writer contract as compaction). Returns the new
    generation's version number."""
    from ..sinks.snapshot_store import SnapshotStore

    root = _index_root(spark, index_dir)
    # crash debris must not leak into the new generation
    xo.recover_swap(os.path.join(root, "postings"))
    xo.drop_uncommitted_segments(index_dir, [os.path.join(root, "postings")])
    live = _live_postings(spark, index_dir).localCheckpoint()
    n_live = live.count()
    _, cents = kmeans_lloyd_full(
        live.select("vec_id", "v"), k=n_cells, iters=iters, vec_col="v"
    )
    reassigned = _assign(live.select("vec_id", "v"), cents)
    mean_d2 = reassigned.agg(F.avg("d")).collect()[0][0]

    def build(staging: str) -> None:
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

    store = SnapshotStore(spark, os.path.join(index_dir, "state"))
    return store.publish_dir(
        build,
        audit=lambda staging: spark.read.schema(POSTINGS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(os.path.join(staging, "postings"))
        .count()
        == n_live,
    )
