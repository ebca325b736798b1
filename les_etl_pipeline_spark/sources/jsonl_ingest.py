"""JSONL corpus source — the interchange format LLM training corpora
actually ship in (one JSON document per line).

Design points for 100 TB:
- **Explicit schema, never inference.** `spark.read.json` without a
  schema scans the data once just to infer types — at corpus scale that
  doubles the read. Callers pass a StructType (or use DOC_SCHEMA).
- **PERMISSIVE + corrupt-record capture.** Real corpora contain broken
  lines; failing the job (FAILFAST) or silently dropping (DROPMALFORMED)
  are both wrong for a pipeline with a quarantine contract. Malformed
  lines land in ``_corrupt_record`` and split into a bad-rows DataFrame,
  mirroring the engine's CSV quarantine path (sinks.write_quarantine).
- JSONL is splittable (newline-delimited, no enclosing array), so the
  scan parallelizes per HDFS/object-store block like CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# the documents-table shape (TESTDATA.md) as the default corpus schema
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    paths: "str | list[str]",
    schema: T.StructType = DOC_SCHEMA,
    required: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL into (good, bad) DataFrames.

    bad rows = unparseable lines (caught via _corrupt_record) plus rows
    missing any ``required`` field; bad carries a single ``raw`` column
    with the offending line (re-serialized for required-field failures).
    """
    # StructType.add mutates in place — never touch the caller's schema
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(paths)
    )
    parse_ok = F.col(CORRUPT_COL).isNull()
    req_ok = F.lit(True)
    for r in required:
        req_ok = req_ok & F.col(r).isNotNull()
    good = df.where(parse_ok & req_ok).drop(CORRUPT_COL)
    # Spark refuses plans that read ONLY _corrupt_record from a raw JSON
    # scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the coalesce over parsed
    # columns both satisfies that and yields the raw line for parse
    # failures / the re-serialized row for required-field failures.
    bad = df.where(~parse_ok | ~req_ok).select(
        F.coalesce(
            F.col(CORRUPT_COL),
            F.to_json(F.struct(*[F.col(f.name) for f in schema.fields])),
        ).alias("raw")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a corpus back out as JSONL (sharded; one JSON object per
    line per part-file). ``partitions`` controls shard count/size —
    target 100-500 MB shards at scale, not the default task count."""
    w = df.repartition(partitions) if partitions else df
    w.write.mode("overwrite").json(path)
