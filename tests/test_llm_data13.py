"""Prefix-filtered Jaccard join: losslessness vs the uncapped exact
expansion, and the candidate-pruning claim measured, not assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import dedup


def test_prefix_filter_is_lossless(spark, sf_dir):
    """Same pairs, same Jaccard values as ngram_jaccard_pairs with NO
    frequency cap — prefix filtering prunes candidates, never results."""
    docs = table(spark, sf_dir, "documents")
    for t in (0.2, 0.3, 0.5):
        got = {
            (r.id_a, r.id_b): round(r.jaccard_raw, 10)
            for r in dedup.jaccard_prefix_filter_pairs(
                docs, k=3, threshold=t
            ).collect()
        }
        exp = {
            (r.id_a, r.id_b): round(r.jaccard_raw, 10)
            for r in dedup.ngram_jaccard_pairs(
                docs, k=3, threshold=t, max_shingle_freq=None
            ).collect()
        }
        assert got == exp, t
        assert got  # the fixture must actually produce pairs


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The candidate join must touch strictly fewer pairs than the full
    posting expansion: compare the prefix x full candidate count against
    the all-shared-shingle pair count at the same threshold."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = 0.3
    sh_arr = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(dedup.shingles("text", 3), lambda s: F.xxhash64(s))
        ).alias("shs"),
    ).localCheckpoint()
    tok = sh_arr.select("doc_id", F.explode("shs").alias("sh"))
    sizes = sh_arr.select("doc_id", F.size("shs").alias("n_sh"))
    # full expansion: every unordered pair sharing any shingle
    full_pairs = (
        tok.select("sh", F.col("doc_id").alias("a"))
        .join(tok.select("sh", F.col("doc_id").alias("b")), "sh")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .count()
    )
    # prefix-filtered candidates (the operator's candidate stage,
    # replicated here so the test measures the stage in isolation)
    dfreq = tok.groupBy("sh").agg(F.count(F.lit(1)).alias("dfr"))
    from pyspark.sql import Window as W

    ranked = (
        tok.join(dfreq, "sh")
        .withColumn(
            "r",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("dfr"), F.col("sh"))
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix = ranked.where(
        F.col("r") <= F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1
    ).select("sh", F.col("doc_id").alias("id_p"))
    cand = (
        prefix.join(tok.select("sh", F.col("doc_id").alias("id_f")), "sh")
        .where(F.col("id_p") != F.col("id_f"))
        .select(
            F.least("id_p", "id_f").alias("a"),
            F.greatest("id_p", "id_f").alias("b"),
        )
        .distinct()
        .count()
    )
    assert cand < full_pairs, (cand, full_pairs)
    # and the true result set is contained in the candidates by a wide
    # margin (sanity: the filter is pruning junk, not results)
    true_pairs = dedup.jaccard_prefix_filter_pairs(docs, k=3, threshold=t).count()
    assert true_pairs <= cand
