"""Table registry over the parquet test warehouse.

Loads the driver-generated tables (TESTDATA.md) as DataFrames with
normalized time types: every time column surfaces as TIMESTAMP_NTZ so the
engine and the DuckDB oracle see identical naive wall-clock values.

``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark cannot
read natively; the session sets ``spark.sql.legacy.parquet.nanosAsLong``
and this loader converts nanoseconds -> microsecond TIMESTAMP_NTZ (same
truncation DuckDB applies).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one warehouse table with normalized column types."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ns since epoch (long, via nanosAsLong) -> µs TIMESTAMP_NTZ.
        # floor-div matches DuckDB's ns->µs truncation.
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(CAST(FLOOR(ts / 1000) AS LONG)) AS TIMESTAMP_NTZ)"),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
