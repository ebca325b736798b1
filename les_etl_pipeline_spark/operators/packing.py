"""Sequence packing: assemble token chunks into fixed-capacity training
sequences (the step between chunking and batch assembly in an LLM data
pipeline).

The algorithm is in-order sequential fill — the distributed version of
"concatenate the corpus, cut every `capacity` tokens": chunks are laid
out in a deterministic order and a running token count assigns each chunk
to sequence ``floor(tokens_before / capacity)``. One window cumsum — no
Python, no shuffle beyond the window's partitioning.

Packing is per ``shard_col`` (e.g. language, or a hash shard): each shard
packs independently in parallel, which is exactly how a 1000-executor run
scales — a GLOBAL ordered window would collapse to a single partition.
For uniform shards derive one with sampling.hash_bucket. In-order fill
can overflow a sequence at a boundary chunk (first-fit, no chunk
splitting); real pipelines either split the straddling chunk downstream
or accept ragged tails — both consume this operator's output unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_chunks(
    df: DataFrame,
    capacity: int,
    shard_col: str,
    order_cols: list[str],
    n_col: str = "n_tokens",
) -> DataFrame:
    """Assign each chunk row a ``seq_idx`` within its shard.

    Deterministic for a deterministic ``order_cols``. Adds:
      seq_idx        sequence number within the shard (0-based)
      tokens_before  running token count before this chunk (same order)
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_col).over(w)
    before = cum - F.col(n_col)
    return df.withColumn("tokens_before", before).withColumn(
        "seq_idx", F.floor(before / F.lit(capacity)).cast("int")
    )


def packing_stats(
    packed: DataFrame, capacity: int, shard_col: str, n_col: str = "n_tokens"
) -> DataFrame:
    """Per-shard packing efficiency: sequences produced and fill ratio
    (fraction of capacity actually holding tokens — the padding-waste
    metric training teams watch)."""
    seqs = packed.groupBy(shard_col, "seq_idx").agg(
        F.count(F.lit(1)).alias("n_chunks"), F.sum(n_col).alias("n_tokens")
    )
    return seqs.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_seqs"),
        (F.sum("n_tokens") / (F.count(F.lit(1)) * F.lit(capacity))).alias("fill_ratio"),
    )
