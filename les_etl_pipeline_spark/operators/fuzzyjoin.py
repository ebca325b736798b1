"""Blocked fuzzy string matching (edit-distance join).

A naive fuzzy join is |A| x |B| levenshtein evaluations — a cartesian
product, dead at any scale. The standard fix is BLOCKING: join on a cheap
equality key that any true match must share (here: a token of the string,
but soundex/first-k-chars/length-bucket all fit the same shape), so the
expensive edit distance runs only inside blocks. The plan is then a plain
equi-join (hash, shuffle on the block key) with levenshtein as a residual
filter — no nested-loop anywhere.

At 100 TB the block-key frequency is the thing to watch (a degenerate
block recreates the quadratic blowup) — same posture as
dedup.ngram_jaccard_pairs' stop-shingle cap: cap block sizes with a
frequency filter when the key distribution is unknown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block_key: Column | None = None,
    max_distance: int = 2,
    max_block_freq: int | None = 10_000,
) -> DataFrame:
    """Pairs (left_col, right_col, distance) with levenshtein <=
    max_distance, equi-joined on ``block_key`` (default: the last
    whitespace token of each string). ``max_block_freq`` drops block
    keys more frequent than the cap on either side (degenerate blocks
    — the quadratic guard); None disables."""

    def key_of(c: Column) -> Column:
        if block_key is not None:
            return block_key
        return F.element_at(F.split(c, r"\s+"), -1)

    lt = left.select(F.col(left_col).alias("left_name")).distinct()
    rt = right.select(F.col(right_col).alias("right_name")).distinct()
    lt = lt.withColumn("_bk", key_of(F.col("left_name")))
    rt = rt.withColumn("_bk", key_of(F.col("right_name")))
    if max_block_freq is not None:
        for side in ("lt", "rt"):
            df = {"lt": lt, "rt": rt}[side]
            hot = (
                df.groupBy("_bk")
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > max_block_freq)
                .select("_bk")
            )
            if side == "lt":
                lt = lt.join(F.broadcast(hot), "_bk", "left_anti")
            else:
                rt = rt.join(F.broadcast(hot), "_bk", "left_anti")
    joined = lt.join(rt, "_bk").where(
        F.levenshtein("left_name", "right_name") <= max_distance
    )
    return joined.select(
        "left_name",
        "right_name",
        F.levenshtein("left_name", "right_name").cast("int").alias("distance"),
    )
