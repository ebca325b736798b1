"""EDW deal-details XML ingest (S2/S5, /root/reference/src/
les_etl_pipeline/generate_deal_details_bronze.py:24-49,77-144).

Each deal publishes ONE small XML with scalar deal metadata — a
1-row-per-submission table. Parsing stays on the driver by design
(SURVEY.md §2.1 S5: "driver lxml (1 row, fine)"); for bulk XML corpora
the spark-xml data source would replace this, but a per-deal metadata file
is not a scale surface.

Layout semantics reproduced:
- scalar children -> columns; namespace-stripped tags
- ISIN list -> ';'-joined string (legacy view) — expose_isin_array adds
  the proper ArrayType variant (SURVEY.md §1.2)
- Country / DealVisibleToOrg / DealVisibleToUser dropped
- first Submissions child inlined, minus MetricData / IsProvisional /
  IsRestructured
- EDCode -> ed_code; '' -> NULL
"""

from __future__ import annotations

import glob
import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DROP_DEAL = {"Country", "DealVisibleToOrg", "DealVisibleToUser", "Submissions", "ISIN"}
_DROP_SUBMISSION = {"MetricData", "IsProvisional", "IsRestructured"}


def find_deal_xml(prefix: str, file_key: str = "") -> str:
    """S2: exactly one matching .xml under the prefix; error on 0 or >1
    (generate_deal_details_bronze.py:24-49)."""
    matches = [
        p
        for p in sorted(glob.glob(os.path.join(prefix, "**", "*.xml"), recursive=True))
        if file_key in os.path.basename(p)
    ]
    if len(matches) != 1:
        raise FileNotFoundError(
            f"expected exactly one deal-details XML under {prefix!r} "
            f"matching {file_key!r}, found {len(matches)}"
        )
    return matches[0]


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_deal_xml(path: str) -> dict[str, str | None]:
    """Walk the fixed EDW layout into one flat row dict."""
    root = ET.parse(path).getroot()
    row: dict[str, str | None] = {}
    isins: list[str] = []
    submissions = None
    for child in root:
        name = _localname(child.tag)
        if name == "ISIN":
            isins = [(c.text or "") for c in child] or ([child.text] if child.text else [])
            continue
        if name == "Submissions":
            submissions = child
            continue
        if name in _DROP_DEAL:
            continue
        row[name] = child.text
    row["ISIN"] = ";".join(i for i in isins if i)
    if submissions is not None and len(submissions):
        first = submissions[0]
        for sub in first:
            name = _localname(sub.tag)
            if name in _DROP_SUBMISSION:
                continue
            row[name] = sub.text
    if "EDCode" in row:
        row["ed_code"] = row.pop("EDCode")
    return {k: (None if v == "" else v) for k, v in row.items()}


def read_deal_details(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """One row per XML file, all columns StringType (bronze contract)."""
    if isinstance(paths, str):
        paths = [paths]
    rows = [parse_deal_xml(p) for p in paths]
    cols = sorted({k for r in rows for k in r})
    data = [tuple(r.get(c) for c in cols) for r in rows]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(data, schema)


def expose_isin_array(df: DataFrame) -> DataFrame:
    """ArrayType view of the legacy ';'-joined ISIN column."""
    return df.withColumn("ISIN_array", F.split(F.col("ISIN"), ";"))


#: deal-level scalar fields the distributed reader extracts (superset-safe:
#: fields absent from a file parse to NULL)
DIST_DEAL_FIELDS = (
    "EDCode AssetClassCode AssetClassName DealSize DealVersion IsActiveDeal"
).split()
DIST_SUBMISSION_FIELDS = (
    "PoolCutOffDate CurrentPoolBalance NumberOfActiveAssets"
).split()


def read_deal_details_distributed(
    spark: SparkSession,
    paths: list[str] | str,
    deal_fields: list[str] | None = None,
    submission_fields: list[str] | None = None,
) -> DataFrame:
    """Distributed twin of read_deal_details via Spark 4's built-in
    from_xml: files scan in parallel (wholetext) and the XML walk runs
    as a Catalyst expression on executors — no driver lxml loop. Same
    output contract as the driver-side reader: scalar children as string
    columns, ISIN ';'-joined, visibility fields dropped, first
    Submission inlined minus its drop set, EDCode -> ed_code, '' -> NULL.

    The reference parses deal XML driver-side
    (generate_deal_details_bronze.py:77-144) and SURVEY.md §2.1 S5
    blesses that for 1-row-per-deal files; this path is for when deal
    counts explode — 10^6 small XMLs become one distributed scan."""
    deal_fields = deal_fields or DIST_DEAL_FIELDS
    submission_fields = submission_fields or DIST_SUBMISSION_FIELDS
    if isinstance(paths, str):
        paths = [paths]
    xml_schema = (
        ", ".join(f"{f} string" for f in deal_fields)
        + ", ISIN struct<code: array<string>>, Submissions struct<Submission: array<struct<"
        + ", ".join(f"{f}: string" for f in submission_fields)
        + ">>>"
    )
    raw = spark.read.text(paths, wholetext=True)
    x = F.from_xml(F.col("value"), xml_schema)
    first_sub = x["Submissions"]["Submission"][0]
    cols = [
        F.nullif(x[f], F.lit("")).alias("ed_code" if f == "EDCode" else f)
        for f in deal_fields
    ]
    cols.append(F.array_join(x["ISIN"]["code"], ";").alias("ISIN"))
    cols.extend(
        F.nullif(first_sub[f], F.lit("")).alias(f) for f in submission_fields
    )
    return raw.select(*cols)
