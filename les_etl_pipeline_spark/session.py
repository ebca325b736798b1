"""SparkSession factory.

Carries forward the reference's proven session configuration
(/root/reference/src/les_main.py:27-50: parquet filter pushdown, dynamic
partition overwrite, CORRECTED datetime rebase, no _SUCCESS markers) minus
its GCS/Delta-on-GCS specifics, and adds the scale-oriented defaults the
reference predates: AQE (runtime re-planning, skew-join splitting,
partition coalescing) and Arrow-accelerated Python interop.

Designed for a real cluster; on local[N] the same confs apply with the
shuffle partition count sized to the core count instead of the default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "les_etl_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    At 100 TB the same builder is pointed at a cluster master and
    ``shuffle_partitions`` is sized to ~2-3x total executor cores with AQE
    coalescing handling the remainder; nothing else here is local-specific.
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(cpus, 8))
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # deterministic timezone: oracle (DuckDB) compares assume UTC
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI mode is deliberately NOT overridden: the engine must produce
        # identical results on a stock Spark-4 session (ANSI on) and a
        # legacy one — reference NULL-on-garbage semantics are expressed
        # with try_cast/try_* so they are mode-independent
        # (operators/cast_engine.py). Two rounds of driver failures came
        # from builder-session-only conf assumptions; tests now run with
        # Spark defaults.
        # shuffle sizing + AQE: runtime coalesce, skew-join handling
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # scan-side: pushdown + pruning (reference: les_main.py:45-47)
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.sql.hive.metastorePartitionPruning", "true")
        # write-side (reference: les_main.py:40-44,50)
        .config("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
            "false",
        )
        .config("parquet.enable.summary-metadata", "false")
        # Arrow for pandas_udf / toPandas interop (vectorized Python path)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # (events.parquet TIMESTAMP(NANOS) handling lives in catalog.table,
        # which flips nanosAsLong only around its own read — no session-wide
        # legacy conf needed here)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # codegen class cache sized for an engine with hundreds of
        # distinct query fragments (r14, measured): the default cache of
        # 100 generated classes thrashes on a session that executes this
        # registry repeatedly — every eviction re-runs Janino AND throws
        # away the JIT-compiled code, so the JVM re-compiles ~50 s of
        # CPU per suite pass forever (aging probe, default vs 5000
        # entries: JIT time growth +45 s/pass never settling vs +8 s/pass
        # settling; steady-state pass 117-180 s vs 97-102 s). Cost is
        # bounded metaspace (generated classes are KB-scale). The same
        # churn hits cluster executors at 100 TB — this is a workload
        # property (query-fragment cardinality), not a local[] tuning.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4096"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
