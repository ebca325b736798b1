"""Golden end-to-end tests: EDW-style fixtures through bronze -> silver
(SURVEY.md §5.2), pinning ingest normalization, lineage, SCD2 stamping,
validation quarantine, cast maps, and topic vertical partitioning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from les_etl_pipeline_spark import pipelines, schemas
from les_etl_pipeline_spark.sinks.writers import RunLedger
from les_etl_pipeline_spark.sources.csv_ingest import list_csv_files, read_edw_csv
from les_etl_pipeline_spark.sources.xml_ingest import (
    expose_isin_array,
    parse_deal_xml,
    read_deal_details,
)

from .fixtures import DEFAULT_ASSET_ROWS, write_asset_csv, write_deal_xml


@pytest.fixture()
def raw_dir(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    write_asset_csv(str(d), "LESIT01", (2023, 6, 30), DEFAULT_ASSET_ROWS)
    write_asset_csv(str(d), "LESIT02", (2023, 7, 31), DEFAULT_ASSET_ROWS[:2])
    return str(d)


def test_csv_discovery_excludes_labeled(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    keep = write_asset_csv(str(d), "LESIT01", (2023, 6, 30), DEFAULT_ASSET_ROWS[:1])
    labeled = os.path.join(str(d), "LESIT01_2023_06_30_Labeled.csv")
    os.rename(write_asset_csv(str(d), "X", (2023, 6, 30), DEFAULT_ASSET_ROWS[:1]), labeled)
    found = list_csv_files(str(d), data_type="assets")
    assert keep in found and labeled not in found


def test_ingest_normalization_and_lineage(spark, raw_dir):
    df = read_edw_csv(spark, list_csv_files(raw_dir), "assets")
    rows = {(r["ed_code"], r["AL5"]): r for r in df.collect()}
    # header first cell renamed to AL1; label row and blank row skipped
    assert "AL1" in df.columns
    assert len(rows) == 5  # 3 good-ish + 2 from second file
    r = rows[("LESIT01", "ls-1")]
    # lower/trim applied; lineage parsed from filename
    assert r["AL3"] == "acme servicing"
    assert r["AL7"] == "y"
    assert r["pcd"] == "2023-06-30"
    assert r["filename"].startswith("LESIT01_2023_06_30")
    # null markers: ND5 -> None, 'No Collateral' -> None, '' -> None
    assert rows[("LESIT01", "ls-2")]["AL18"] is None
    assert rows[("LESIT01", "ls-3")]["AL3"] is None
    assert rows[("LESIT01", "ls-3")]["AL56"] is None


def test_bronze_to_silver_e2e(spark, raw_dir, tmp_path):
    bronze_path = str(tmp_path / "bronze_assets")
    out_dir = str(tmp_path / "silver")
    ledger = RunLedger(spark, str(tmp_path / "ledger"))

    stamped = pipelines.bronze_csv(
        spark, raw_dir, bronze_path, "assets",
        ingestion_date="2023-08-01", ledger=ledger,
    )
    # SCD2 stamping (F1-F6) + part key
    b = spark.read.parquet(bronze_path)
    assert {"valid_from", "valid_to", "iscurrent", "checksum", "part"} <= set(b.columns)
    assert b.where(F.col("iscurrent") == 1).count() == 5
    parts = {r["part"] for r in b.select("part").distinct().collect()}
    assert parts == {"LESIT01_20230630", "LESIT02_20230731"}
    # ledger idempotence marker recorded per deal
    assert ledger.has_run("assets", "2023-08-01", "LESIT01")
    assert not ledger.has_run("assets", "2023-08-02", "LESIT01")

    topics = pipelines.silver_assets(spark, bronze_path, out_dir)
    # quarantine captured the AL56-required violation (1 bad row per file-1)
    bad = spark.read.parquet(os.path.join(out_dir, "dirty_dumps", "assets"))
    assert bad.count() == 1
    assert "AL56.required" in bad.collect()[0]["qc_errors"]
    # typed silver topic table, vertically partitioned + deduped
    lease = spark.read.parquet(os.path.join(out_dir, "assets", "lease_info"))
    assert lease.schema["AL30"].dataType.typeName() == "double"
    assert lease.schema["AL1"].dataType.typeName() == "date"
    al30 = {r["AL30"] for r in lease.select("AL30").collect()}
    assert al30 == {7.25, 1.5}
    # zero-extra-pass QC accounting (Observation API): the metrics row
    # written from the quarantine action's own scan matches reality
    qc = spark.read.parquet(os.path.join(out_dir, "qc_metrics", "assets")).collect()[0]
    n_current = b.where(F.col("iscurrent") == 1).count()
    assert (qc["n_rows"], qc["n_bad"]) == (n_current, 1)
    assert qc["n_good"] == n_current - 1


def test_bronze_rerun_idempotent(spark, raw_dir, tmp_path):
    bronze_path = str(tmp_path / "bronze_assets")
    pipelines.bronze_csv(spark, raw_dir, bronze_path, "assets")
    first = spark.read.parquet(bronze_path)
    n1 = first.count()
    cur1 = first.where(F.col("iscurrent") == 1).count()
    # re-run the same batch: SCD2 merge must be a no-op (same checksums)
    pipelines.bronze_csv(spark, raw_dir, bronze_path, "assets")
    again = spark.read.parquet(bronze_path)
    assert again.count() == n1
    assert again.where(F.col("iscurrent") == 1).count() == cur1


def test_deal_details_xml(spark, tmp_path):
    p = write_deal_xml(str(tmp_path), "LESIT09")
    row = parse_deal_xml(p)
    # drops + inline-first-submission + ISIN join + rename
    assert row["ed_code"] == "LESIT09"
    assert "Country" not in row and "MetricData" not in row
    assert row["ISIN"] == "IT0001;IT0002"
    assert row["PoolCutOffDate"] == "2023-06-30"  # first submission only
    assert row["NumberOfActiveAssets"] == "1042"

    df = read_deal_details(spark, [p])
    assert df.count() == 1
    arr = expose_isin_array(df).collect()[0]["ISIN_array"]
    assert arr == ["IT0001", "IT0002"]

    out = pipelines.bronze_deal_details(spark, [p], str(tmp_path / "bronze_dd"))
    got = out.collect()[0]
    assert got["part"] == "LESIT09_20230630"

    silver = pipelines.silver_deal_details(
        spark, str(tmp_path / "bronze_dd"), str(tmp_path / "silver")
    )
    srow = silver.collect()[0]
    assert srow["DealVersion"] == 3
    assert srow["DealSize"] == 500000000.0
    assert srow["IsActiveDeal"] is True


def test_transliteration_udf(spark):
    from les_etl_pipeline_spark.operators.normalize import transliterate_ascii

    df = spark.createDataFrame(
        [("café münchen",), ("﻿test\0ed",), (None,), ("plain",)], "s string"
    )
    out = [r["t"] for r in df.select(transliterate_ascii("s").alias("t")).collect()]
    assert out == ["cafe munchen", "tested", None, "plain"]


def test_permissive_malformed_rows(spark, tmp_path):
    """S4 bad-line tolerance: PERMISSIVE parsing null-fills short rows and
    truncates long rows (the reference's csv.reader + truncation at
    bronze_funcs.py:93-96 behaves the same; _corrupt_record engages only
    under typed schemas, which bronze — all-string by design — never has)."""
    d = tmp_path / "raw2"
    d.mkdir()
    path = d / "LESIT03_2023_06_30_assets.csv"
    path.write_text(
        'AL1,AL2,AL3\n'
        'lbl1,lbl2,lbl3\n'
        '2023-06-30,pool-1,servicer\n'
        '2023-06-30,short\n'
        'x,y,z,extra,cols\n'
    )
    df = read_edw_csv(spark, [str(path)], "assets", capture_corrupt=True)
    rows = df.collect()
    assert "_corrupt_record" in df.columns
    assert len(rows) == 3
    by_al2 = {r["AL2"]: r for r in rows}
    assert by_al2["pool-1"]["AL3"] == "servicer"
    assert by_al2["short"]["AL3"] is None   # short row null-filled
    assert by_al2["y"]["AL3"] == "z"        # long row truncated to header width


def test_bronze_ledger_skip(spark, raw_dir, tmp_path):
    """S3/O4: a (date, deal) already in the ledger is not re-processed."""
    ledger = RunLedger(spark, str(tmp_path / "ledger"))
    out = str(tmp_path / "bronze")
    pipelines.bronze_csv(spark, raw_dir, out, "assets",
                         ingestion_date="2023-08-01", ledger=ledger)
    # second run same date: every deal ledgered -> skipped entirely
    res = pipelines.bronze_csv(spark, raw_dir, out, "assets",
                               ingestion_date="2023-08-01", ledger=ledger)
    assert res is None
    # different date: processes again (and SCD2-merges as a no-op)
    res2 = pipelines.bronze_csv(spark, raw_dir, out, "assets",
                                ingestion_date="2023-08-02", ledger=ledger)
    assert res2 is not None


def test_wide_asset_all_topics(spark, tmp_path):
    """Full-width fixture exercises all six topic tables (P9 ranges) with
    typed columns in each."""
    from .fixtures import write_wide_asset_csv

    raw = tmp_path / "rawwide"
    raw.mkdir()
    write_wide_asset_csv(str(raw), "LESIT77", (2023, 6, 30))
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "silver")
    pipelines.bronze_csv(spark, str(raw), bronze, "assets")
    topics = pipelines.silver_assets(spark, bronze, out)
    assert set(topics) == {
        "lease_info", "lease_features", "interest_rate",
        "financial_info", "performance_info", "collateral_info",
    }
    feats = spark.read.parquet(os.path.join(out, "assets", "lease_features"))
    # AL50 ('2019', year-only): Spark's default to_date parser (which the
    # reference's F8 also used) accepts bare years -> 2019-01-01
    assert feats.schema["AL50"].dataType.typeName() == "date"
    import datetime
    assert {r["AL50"] for r in feats.select("AL50").collect()} == {datetime.date(2019, 1, 1)}
    assert feats.schema["AL55"].dataType.typeName() == "double"
    fin = spark.read.parquet(os.path.join(out, "assets", "financial_info"))
    assert {r["AL83"] for r in fin.select("AL83").collect()} == {300.0, 301.0, 302.0, 303.0}


def test_bond_info_e2e(spark, tmp_path):
    """bond_info bronze -> silver: BL1 header rename, topic split
    (bond/transaction/tranche), validation quarantine."""
    from .fixtures import write_bond_csv

    raw = tmp_path / "rawbond"
    raw.mkdir()
    write_bond_csv(str(raw), "BNDIT01", (2023, 6, 30))
    bronze = str(tmp_path / "bronze_bond")
    out = str(tmp_path / "silver")
    pipelines.bronze_csv(spark, str(raw), bronze, "bond_info")
    b = spark.read.parquet(bronze)
    assert "BL1" in b.columns  # first header cell force-renamed
    assert b.where(F.col("iscurrent") == 1).count() == 3

    topics = pipelines.silver_bond_info(spark, bronze, out)
    assert set(topics) == {"bond_info", "transaction_info", "tranche_info"}
    bad = spark.read.parquet(os.path.join(out, "dirty_dumps", "bond_info"))
    # row 3 violates: BL19 required (empty), BL32 enum (99),
    # BL38 below min (2011), BL39 required (empty), BL13 number ('x')
    assert bad.count() == 1
    qc = bad.collect()[0]["qc_errors"]
    for err in ("BL19.required", "BL32.allowed", "BL38.min", "BL39.required", "BL13.number"):
        assert err in qc, (err, qc)
    tr = spark.read.parquet(os.path.join(out, "bond_info", "tranche_info"))
    assert tr.schema["BL32"].dataType.typeName() == "string"
    assert {r["BL25"] for r in tr.select("BL25").collect()} == {"tranche-a", "tranche-b"}
    bi = spark.read.parquet(os.path.join(out, "bond_info", "bond_info"))
    assert bi.schema["BL11"].dataType.typeName() == "double"
    vals = {r["BL11"] for r in bi.select("BL11").collect()}
    assert vals == {12345.67, None}  # ND1 -> NULL at ingest


def test_distributed_xml_parity(spark, tmp_path):
    """S5 at scale: the from_xml distributed reader reproduces the
    driver-side walk field-for-field on the shared schema, across
    multiple deal files in one scan."""
    from .fixtures import write_deal_xml
    from les_etl_pipeline_spark.sources.xml_ingest import (
        DIST_DEAL_FIELDS,
        DIST_SUBMISSION_FIELDS,
        read_deal_details,
        read_deal_details_distributed,
    )

    d = tmp_path / "deals"
    d.mkdir()
    paths = [str(write_deal_xml(str(d), ed)) for ed in ("LESIT01", "LESIT02")]
    driver_df = read_deal_details(spark, paths)
    dist_df = read_deal_details_distributed(spark, paths)
    shared = [
        ("ed_code" if f == "EDCode" else f) for f in DIST_DEAL_FIELDS
    ] + ["ISIN"] + list(DIST_SUBMISSION_FIELDS)
    a = {r["ed_code"]: r for r in driver_df.select(*shared).collect()}
    b = {r["ed_code"]: r for r in dist_df.select(*shared).collect()}
    assert set(a) == {"LESIT01", "LESIT02"} and a.keys() == b.keys()
    for k in a:
        assert a[k].asDict() == b[k].asDict()
    # dropped fields must not leak through the distributed path
    assert not {"Country", "DealVisibleToOrg", "MetricData"} & set(dist_df.columns)


def test_observed_qc_metrics_ride_the_write(spark, tmp_path):
    """observe()-based QC: row count and per-column null counts are
    computed DURING the write action — no second scan — and match the
    ground truth."""
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.operators.qc import observed, standard_qc_metrics

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, "e")], "id long, v string"
    )
    inst, obs = observed(df, standard_qc_metrics(df, null_cols=["v"]))
    inst.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got == {"n_rows": 5, "n_null_v": 2}
