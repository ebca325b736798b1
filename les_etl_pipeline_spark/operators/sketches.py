"""Mergeable sketch operators expressed as plain DataFrames.

Two families the reference-era warehouse lacked but every 100 TB
analytics stack wants:

- A count-min sketch materialized AS A TABLE of (row, pos, c) cells
  rather than an opaque binary blob. Building it is one groupBy (with
  map-side combine); merging two sketches is ``union`` + ``sum`` — the
  partial-aggregate-merge property falls out of relational algebra
  instead of custom serialization. Because the cell arithmetic is plain
  md5 math, an independent engine (DuckDB) can replay it exactly, so
  the sketch is oracle-checkable — unlike ``F.count_min_sketch``'s
  opaque binary (which exists and is exercised in tests, but can't be
  cross-verified value-by-value).
- Exact distinct counting via Spark 4 bitmap aggregates
  (``bitmap_bit_position`` / ``bitmap_construct_agg`` / ``bitmap_count``):
  the two-level shape that replaces ``count(DISTINCT)``'s single giant
  hash per group with per-(group, 32k-bucket) bitmaps that are tiny,
  mergeable (``bitmap_or_agg``) and skew-proof. At 100 TB this is how
  you count distinct int keys without one reducer owning a hot group's
  whole key set.

Reference parity note: the reference ETL has no sketch surface at all
(SURVEY.md §2.5 — its aggregates stop at hash aggs); this module is
part of the §2.12/LLM-data gap surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default CMS geometry — width*depth cells bound the absolute error at
#: eps ~ e/width of the total stream count with prob 1 - (1/e)^depth.
CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_pos(value: Column, row: Column | int, width: int) -> Column:
    """Cell column for one CMS hash row: md5-derived uniform bucket,
    engine-portable (DuckDB: ('0x' || substr(md5(i || ':' || v), 1, 7))
    ::BIGINT % width). 7 hex chars < 2^28, safely inside BIGINT."""
    r = F.lit(row) if isinstance(row, int) else row
    key = F.concat(r.cast("string"), F.lit(":"), value.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("long") % F.lit(width)


def cms_build(
    df: DataFrame,
    value: Column | str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a count-min sketch over a value stream as a (row, pos, c)
    cell table (at most depth*width rows, independent of stream size).

    ONE pass over the data: each occurrence contributes ``depth`` cell
    increments (a generator explode of the row index), and the groupBy
    partial-aggregates map-side, so the shuffle carries at most
    depth*width*partitions rows. Sketches from disjoint shards merge
    with ``cms_merge`` — the property that makes this work as a
    streaming/foreachBatch accumulator too.
    """
    v = F.col(value) if isinstance(value, str) else value
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(v.alias("_v"))
        .select(rows, F.col("_v"))
        .select(F.col("row"), _cms_pos(F.col("_v"), F.col("row"), width).alias("pos"))
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS cell tables built with identical geometry: union + sum.
    (Counts are additive per cell — the defining CMS property.)"""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "pos").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value: Column | str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate stream counts for each candidate value: min over
    the depth rows of the candidate's cell counts (the classic CMS
    query; estimate >= true count always, and <= true + eps*N w.h.p.).

    The sketch is at most depth*width rows — broadcast — so estimating
    any number of candidates is a map-side join, no shuffle of the
    candidate stream. A cell the candidate hashes to that is absent from
    the sketch means nothing hashed there: count 0.
    """
    v = F.col(value) if isinstance(value, str) else value
    probes = candidates.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    ).withColumn("pos", _cms_pos(v, F.col("row"), width))
    keys = [c for c in candidates.columns]
    return (
        probes.join(F.broadcast(sketch), ["row", "pos"], "left")
        .groupBy(*keys)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_c"))
    )


def bitmap_distinct(df: DataFrame, group_cols: list[str], key: Column | str) -> DataFrame:
    """Exact COUNT(DISTINCT key) per group via bitmap aggregation.

    Two-level plan: (group, bucket-of-32768-keys) -> one bitmap each via
    ``bitmap_construct_agg`` (map-side combinable, each bitmap <= 4 KB),
    then per group sum of ``bitmap_count``. Compared to
    ``countDistinct`` this never materializes a per-group hash set on a
    single reducer — a hot group's keys spread across its buckets, so
    the shape survives heavy group skew. Exact, not approximate.

    Returns group_cols + n_distinct. Key must be integral (bitmap
    position semantics); null keys are ignored like COUNT(DISTINCT).
    """
    k = F.col(key) if isinstance(key, str) else key
    per_bucket = (
        df.where(k.isNotNull())
        .select(
            *group_cols,
            F.bitmap_bucket_number(k).alias("_bucket"),
            F.bitmap_bit_position(k).alias("_bit"),
        )
        .groupBy(*group_cols, "_bucket")
        .agg(F.bitmap_construct_agg(F.col("_bit")).alias("_bm"))
    )
    return (
        per_bucket.groupBy(*group_cols)
        .agg(F.sum(F.bitmap_count("_bm")).alias("n_distinct"))
    )
