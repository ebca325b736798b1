"""Thirteenth relational pack: sketch-shaped aggregation.

- ``sketch_bitmap_exact_distinct``: exact COUNT(DISTINCT) via Spark 4
  bitmap aggregates — the skew-proof two-level distinct
  (operators/sketches.bitmap_distinct).
- ``sketch_cms_token_freq``: a count-min sketch materialized as a cell
  TABLE with engine-portable md5 cell math, so DuckDB replays the whole
  sketch and the estimates hash-match exactly
  (operators/sketches.cms_build/cms_estimate).
- ``agg_bit_reduce``: bit_and / bit_or / bit_xor reduction aggregates —
  the flag-word folding face of §2.5's aggregate surface.

Reference parity: the reference has no sketches or bit reductions
(SURVEY.md §2.5 stops at hash aggs); this pack belongs to the §2.12 gap
surface the build brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import sketches
from .registry import register


@register(
    "sketch_bitmap_exact_distinct",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    GROUP BY order_month ORDER BY order_month
    """,
)
def sketch_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order month, computed EXACTLY through
    bitmap aggregation instead of count(DISTINCT): keys fold into
    per-(month, 32k-bucket) bitmaps (map-side combinable, <= 4 KB each),
    then bitmap_count sums per month. At 100 TB a hot month's keys
    spread over its buckets instead of landing on one reducer as a
    giant hash set — same answer, skew-proof shape. The oracle is the
    plain COUNT(DISTINCT), pinning exactness."""
    o = table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"), "o_custkey"
    )
    return (
        sketches.bitmap_distinct(o, ["order_month"], "o_custkey")
        .select("order_month", F.col("n_distinct").cast("long").alias("n_distinct"))
        .orderBy("order_month")
    )


@register(
    "sketch_cms_token_freq",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL
    ), toks_ne AS (
      SELECT tok FROM toks WHERE tok <> ''
    ), counts AS (
      SELECT tok, count(*) AS true_c FROM toks_ne GROUP BY tok
    ), top AS (
      SELECT tok, true_c FROM counts ORDER BY true_c DESC, tok LIMIT 20
    ), hrows AS (
      SELECT unnest(generate_series(0, 3)) AS row
    ), sketch AS (
      SELECT row,
             ('0x' || substr(md5(row || ':' || tok), 1, 7))::BIGINT % 2048 AS pos,
             count(*) AS c
      FROM toks_ne CROSS JOIN hrows
      GROUP BY row, pos
    )
    SELECT top.tok,
           CAST(top.true_c AS BIGINT) AS true_c,
           CAST(min(coalesce(s.c, 0)) AS BIGINT) AS est_c
    FROM top CROSS JOIN hrows h
    LEFT JOIN sketch s
      ON s.row = h.row
     AND s.pos = ('0x' || substr(md5(h.row || ':' || top.tok), 1, 7))::BIGINT % 2048
    GROUP BY top.tok, top.true_c
    ORDER BY true_c DESC, tok
    """,
)
def sketch_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, probed for the 20
    most frequent tokens, next to their true counts.

    The sketch is a (row, pos, c) cell TABLE (4 x 2048 cells max — fixed
    size however large the stream), built in one pass with map-side
    combine and merged across shards by union+sum
    (operators/sketches.cms_build / cms_merge). Cell positions are
    md5-derived so DuckDB replays the identical sketch: est_c
    hash-matches cell-for-cell, turning the usual "approximate, trust
    me" sketch into an oracle-checkable one. CMS guarantee (est >= true,
    est <= true + eps*N w.h.p.) is additionally property-tested in
    tests/test_round5_ops.py."""
    toks = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    # ONE corpus explode: the token-grain count table feeds both the
    # sketch (cells are sums, so weighting each distinct token by its
    # count is cell-identical to replaying the stream) and the top-20
    # true counts — the old form ran the explode+scan once per consumer,
    # and hashed every occurrence instead of every distinct token (r14,
    # guide §2.2/§2.4). The grain table is vocabulary-sized; the lazy
    # checkpoint stops the second consumer re-running the corpus scan.
    tok_counts = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_c"))
        .localCheckpoint(eager=False)
    )
    sketch = sketches.cms_build(
        tok_counts, "tok", depth=4, width=2048, weight="true_c"
    )
    top = tok_counts.orderBy(F.col("true_c").desc(), "tok").limit(20)
    return (
        sketches.cms_estimate(sketch, top, "tok", depth=4, width=2048)
        .select("tok", "true_c", F.col("est_c").cast("long").alias("est_c"))
        .orderBy(F.col("true_c").desc(), "tok")
    )


@register(
    "agg_bit_reduce",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_partkey) AS BIGINT) AS pk_and,
           CAST(bit_or(l_partkey)  AS BIGINT) AS pk_or,
           CAST(bit_xor(l_partkey) AS BIGINT) AS pk_xor,
           CAST(bit_count(bit_or(l_partkey)) AS INT) AS or_popcount
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_bit_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise reduction aggregates — AND/OR/XOR folds over a key column
    per group (flag-word intersection/union and parity fingerprinting).
    Pure hash aggregate with map-side combine; completes §2.5's
    aggregate family next to the arithmetic and boolean reductions."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_partkey").alias("pk_and"),
            F.bit_or("l_partkey").alias("pk_or"),
            F.bit_xor("l_partkey").alias("pk_xor"),
            F.bit_count(F.bit_or("l_partkey")).cast("int").alias("or_popcount"),
        )
        .orderBy("l_returnflag")
    )
