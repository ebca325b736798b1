"""End-to-end bronze/silver pipelines — the reference's five stage jobs
(les_main.py:77-121 dispatcher -> generate_bronze_tables /
generate_deal_details_bronze / generate_*_silver) collapsed into library
calls on one SparkSession (SURVEY.md §3: the per-deal Dataproc-batch
boundary disappears; `part` partitioning provides the same isolation).

Key structural differences from the reference, by design (SURVEY.md §4.2):
- all deals/files process as ONE partitioned DataFrame job, not a driver
  loop over files with per-file createDataFrame
- the validated DataFrame is persisted once and shared across the
  good/bad split and every topic write (the reference recomputed the
  Python validation pass per consumer)
- SCD2 merge is real (operators/scd2.py) instead of dead perform_scd2
- writes fail loudly (no retry-swallow)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from . import schemas
from .operators import scd2 as scd2_ops
from .operators.cast_engine import cast_to_datatype
from .operators.normalize import scd2_stamp
from .operators.validation import profile_data
from .operators.vertical import range_columns, topic_tables
from .sinks.writers import RunLedger, write_partitioned, write_quarantine
from .sources.csv_ingest import list_csv_files, read_edw_csv
from .sources.xml_ingest import read_deal_details


def bronze_csv(
    spark: SparkSession,
    raw_prefix: str,
    out_path: str,
    data_type: str = "assets",
    file_key: str = "",
    ingestion_date: str = "",
    ledger: RunLedger | None = None,
) -> DataFrame | None:
    """Bronze load for assets/bond_info: discover -> distributed read ->
    normalize -> SCD2 stamp -> merge with existing -> partitioned write."""
    paths = list_csv_files(raw_prefix, file_key, data_type)
    if not paths:
        return None
    if ledger is not None and ingestion_date:
        # S3/O4 idempotence guard: skip files whose (ed_code, pcd) already
        # ran this date — keying on ed_code alone would wrongly skip a
        # later file for the same deal with a new pool-cutoff date
        done = {
            (r["ed_code"], r["pcd"])
            for r in ledger.entries(data_type)
            .where(F.col("ingestion_date") == ingestion_date)
            .collect()
        }

        def _file_key(p: str) -> tuple[str, str]:
            # {ed_code}_{YYYY}_{MM}_{DD}_*.csv -> (ed_code, 'YYYY-MM-DD'),
            # matching normalize.lineage_from_filename / RunLedger.record
            toks = os.path.basename(p).split("_")
            pcd = "-".join(toks[1:4]) if len(toks) >= 4 else ""
            return (toks[0], pcd)

        paths = [p for p in paths if _file_key(p) not in done]
        if not paths:
            return None
    df = read_edw_csv(spark, paths, data_type)
    # checksum over the full data payload (change detection); merge keyed
    # on the row identity (schemas.MERGE_KEYS — see note there)
    payload = sorted(c for c in df.columns if c != "filename")
    stamped = scd2_stamp(df, payload)
    if os.path.exists(out_path):
        old = spark.read.parquet(out_path)
        stamped = scd2_ops.scd2_merge(old, stamped.select(*old.columns),
                                      schemas.MERGE_KEYS[data_type])
    write_partitioned(stamped, out_path)
    if ledger is not None and ingestion_date:
        for r in (
            df.select("ed_code", "pcd").distinct().collect()
        ):  # few deals; driver-side ledger append is the contract (K4)
            ledger.record(data_type, ingestion_date, r["ed_code"], r["pcd"])
    return stamped


def bronze_deal_details(
    spark: SparkSession, xml_paths: list[str], out_path: str
) -> DataFrame:
    """Bronze load for deal_details XML: parse -> stamp -> merge -> write
    (the path where the reference's perform_scd2 was dead, §2.9)."""
    df = read_deal_details(spark, xml_paths)
    df = df.withColumn("pcd", F.col("PoolCutOffDate"))
    stamped = scd2_stamp(df, sorted(c for c in df.columns))
    if os.path.exists(out_path):
        old = spark.read.parquet(out_path)
        stamped = scd2_ops.scd2_merge(old, stamped.select(*old.columns),
                                      schemas.MERGE_KEYS["deal_details"])
    write_partitioned(stamped, out_path)
    return stamped


def _silver(
    spark: SparkSession,
    bronze_path: str,
    out_dir: str,
    data_type: str,
    cast_map: dict,
    rules: dict,
    primary: list[str],
    ranges: dict[str, tuple[str, int, int]],
    part: str | None = None,
) -> dict[str, DataFrame]:
    bronze = spark.read.parquet(bronze_path)
    if part is not None:
        bronze = bronze.where(F.col("part") == part)  # partition-pruned scan (S6/P1)
    snap = scd2_ops.current_snapshot(bronze)

    # single-pass QC accounting (Observation API): row counts ride the
    # quarantine write's own scan — at 100 TB a separate .count() per
    # metric would re-read the whole snapshot once per number. The `bad`
    # branch filters `snap`, so its write evaluates every snapshot row
    # and materializes BOTH observations in that one action.
    obs_all, obs_bad = Observation("qc_rows"), Observation("qc_bad")
    snap = snap.observe(obs_all, F.count(F.lit(1)).alias("n_rows"))
    good, bad = profile_data(snap, rules, strict_columns=False,
                             lineage_cols=schemas.LINEAGE_COLS)
    bad = bad.observe(obs_bad, F.count(F.lit(1)).alias("n_bad"))
    good = good.persist(StorageLevel.MEMORY_AND_DISK)  # shared across topic fan-out
    try:
        write_quarantine(bad, os.path.join(out_dir, "dirty_dumps", data_type))
        n_rows = obs_all.get["n_rows"]
        n_bad = obs_bad.get["n_bad"]
        spark.createDataFrame(
            [(data_type, n_rows, n_bad, n_rows - n_bad)],
            "data_type string, n_rows long, n_bad long, n_good long",
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, "qc_metrics", data_type)
        )
        if good.isEmpty():
            return {}
        typed = cast_to_datatype(good, cast_map)
        topics = {
            name: range_columns(prefix, lo, hi, typed.columns)
            for name, (prefix, lo, hi) in ranges.items()
        }
        present_primary = [c for c in primary if c in typed.columns]
        out = topic_tables(typed, present_primary, topics)
        for name, tdf in out.items():
            write_partitioned(tdf, os.path.join(out_dir, data_type, name))
        return out
    finally:
        good.unpersist()


def silver_assets(spark, bronze_path, out_dir, part=None):
    return _silver(
        spark, bronze_path, out_dir, "assets",
        schemas.ASSET_COLUMNS, schemas.ASSET_RULES,
        schemas.ASSET_PRIMARY, schemas.ASSET_TOPIC_RANGES, part,
    )


def silver_bond_info(spark, bronze_path, out_dir, part=None):
    return _silver(
        spark, bronze_path, out_dir, "bond_info",
        schemas.BOND_COLUMNS, schemas.BOND_RULES,
        schemas.BOND_PRIMARY, schemas.BOND_TOPIC_RANGES, part,
    )


def silver_deal_details(spark, bronze_path, out_dir, part=None):
    """Deal-details silver: cast + dedup (no topic split — one narrow
    table, generate_deal_details_silver.py:96-113)."""
    bronze = spark.read.parquet(bronze_path)
    if part is not None:
        bronze = bronze.where(F.col("part") == part)
    snap = scd2_ops.current_snapshot(bronze)
    typed = cast_to_datatype(snap, schemas.DEAL_DETAILS_COLUMNS)
    out = typed.dropDuplicates(["ed_code", "PoolCutOffDate"])
    write_partitioned(out, os.path.join(out_dir, "deal_details"))
    return out
