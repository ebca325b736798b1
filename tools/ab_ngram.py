"""Controlled same-session A/B of ngram_jaccard_pairs forms (VERDICT r5 #1).

The r5 rework (commit faff069: per-doc distinct-hash ARRAYS as the unit,
sizes read off shuffle-free) measured 2.661 -> 4.049 s at sf0.1 in BENCH_r05
while every other query got faster. Timing on this box is noisy (1.5-4.3 s
observed for this query across contexts), so per the round-5 verdict the
only trustworthy comparison is a warm, alternating, same-session A/B.

Forms (k=3, threshold=0.1, count() as the action; the registered query
now defaults to materialize=True — the winning form of this A/B — so
both materialize settings are measured for each form below):
  r4  — exploded (doc, hash) rows; sizes via groupBy countDistinct
  r5  — per-doc array_distinct arrays; sizes via size(array), no shuffle
Each form also measured with materialize=True, plus the cost of the
`.rdd.getNumPartitions()` probe in isolation.

Usage: python tools/ab_ngram.py [reps=5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import dedup
from les_etl_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def r4_form(df: DataFrame, materialize: bool) -> DataFrame:
    """The pre-faff069 shape, reproduced from git history."""
    src = df.select(F.col("doc_id"), F.col("text").alias("_txt"))
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    sh = src.select("doc_id", F.explode(dedup.shingles("_txt", 3)).alias("sh_str")).select(
        "doc_id", F.xxhash64("sh_str").alias("sh")
    )
    if materialize:
        sh = sh.localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.countDistinct("sh").alias("n_sh"))
    posts = (
        sh.groupBy("sh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .where(F.size("ids") <= 1000)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    inter = (
        posts.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .where(jac >= F.lit(0.1))
        .select("id_a", "id_b", jac.alias("jaccard_raw"))
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark()
    docs = table(spark, SF_DIR, "documents")

    variants = {
        "r4_nomat": lambda: r4_form(docs, materialize=False),
        "r5_nomat": lambda: dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.1, materialize=False),
        "r4_mat": lambda: r4_form(docs, materialize=True),
        "r5_mat": lambda: dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.1, materialize=True),
    }

    # warm everything once (scan cache, codegen)
    counts = {}
    for name, fn in variants.items():
        counts[name] = fn().count()
    assert len(set(counts.values())) == 1, counts

    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():  # alternate forms within each rep
            t0 = time.monotonic()
            fn().count()
            times[name].append(time.monotonic() - t0)

    # isolated probe cost
    src = docs.select("doc_id", F.col("text").alias("_txt"))
    probe = []
    for _ in range(reps):
        t0 = time.monotonic()
        src.rdd.getNumPartitions()
        probe.append(time.monotonic() - t0)

    out = {
        name: {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
            "all": [round(t, 3) for t in ts],
        }
        for name, ts in times.items()
    }
    out["probe_rdd_getNumPartitions"] = {
        "median": round(statistics.median(probe), 4),
        "all": [round(t, 4) for t in probe],
    }
    out["rows"] = counts.popitem()[1]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
