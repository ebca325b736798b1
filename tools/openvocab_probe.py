"""Open-vocabulary scaling probe for the text/dedup operators
(VERDICT r6 #2).

The driver fixture's documents table has a CLOSED ~31-token vocabulary
at every scale factor (FIXTURES.md), which makes every all-pairs token
join quadratic BY CONSTRUCTION and every text-operator slope in
SCALING.md unrepresentative of real corpora (whose vocabulary grows
with corpus size — Heaps' law — over a Zipfian frequency curve). This
probe re-measures the text/dedup operator slopes on the ``synthdocs``
DataSource's ``vocab_mode=open`` corpus (Zipf s=1.5 rank draws rendered
as base-26 words; measured vocab growth ~n^0.66 with a stable head),
writing OPENVOCAB.md.

Method notes:
- The synthetic input is MATERIALIZED (localCheckpoint) before timing,
  so rows measure the operator, not the Python-side generator.
- Operators are probed at geometric doc counts; slope =
  log(t_hi / t_lo) / log(n_hi / n_lo) between the end points — same
  convention as tools/scale_probe.py. Box noise is real (+-20%,
  see SCALING.md header); slopes within ~0.3 of 1.0 are linear-ish.
- The exact tf-idf form is probed at smaller sizes: stop-term heads
  have df ~ O(N) on ANY realistic corpus, so its sum(df^2) pair join
  stays super-linear here too — the point of the max_df-pruned
  registered default.

Usage: python tools/openvocab_probe.py [--quick]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SIZES = [2000, 8000, 32000]
SIZES_EXACT = [2000, 4000, 8000]  # quadratic op: keep the probe bounded


def _make_docs(spark, n_docs: int):
    df = (
        spark.read.format("synthdocs")
        .option("n_docs", n_docs)
        .option("n_partitions", 32)
        .option("vocab_mode", "open")
        .load()
        .localCheckpoint()
    )
    df.count()  # force materialization outside the timed window
    return df


def _time(thunk) -> float:
    """Time one operator run: build + execute. DataFrame results are
    driven by a noop write; driver-side ops (BPE training) do their
    work inside the thunk itself."""
    t0 = time.time()
    out = thunk()
    if out is not None:
        out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    quick = "--quick" in sys.argv
    sizes = SIZES[:2] if quick else SIZES
    sizes_exact = SIZES_EXACT[:2] if quick else SIZES_EXACT

    from les_etl_pipeline_spark.operators import dedup, text as text_ops
    from les_etl_pipeline_spark.queries.llm_data8 import tfidf_cosine_pairs_df
    from les_etl_pipeline_spark.session import get_spark
    from les_etl_pipeline_spark.sources.pydatasource import SynthDocsDataSource

    spark = get_spark("openvocab-probe", shuffle_partitions=32)
    spark.dataSource.register(SynthDocsDataSource)

    OPS = [
        ("dedup_exact_groups", sizes, lambda d: dedup.exact_dedup_groups(d)),
        ("dedup_ngram_jaccard", sizes, lambda d: dedup.ngram_jaccard_pairs(d)),
        ("dedup_ngram_containment", sizes,
         lambda d: dedup.ngram_containment_pairs(d)),
        ("dedup_minhash_banded_md5", sizes,
         lambda d: dedup.minhash_banded_pairs(d, threshold=0.5, hash_family="md5")),
        ("dedup_minhash_banded_xxhash", sizes,
         lambda d: dedup.minhash_banded_pairs(d, threshold=0.5,
                                              hash_family="xxhash64")),
        # exact (uncapped) simhash at bounded sizes: Zipf-head-dominated
        # corpora cluster signatures (common words drive the bit votes),
        # so uncapped band buckets grow super-linearly — the documented
        # degenerate-bucket regime; the capped row below is the scale path
        ("dedup_simhash_hamming (exact)", sizes_exact,
         lambda d: dedup.simhash_hamming_pairs(d)),
        ("dedup_simhash_hamming (max_bucket 1000)", sizes,
         lambda d: dedup.simhash_hamming_pairs(d, max_bucket=1000)),
        ("text_tfidf_cosine_pairs (max_df 1000)", sizes,
         lambda d: tfidf_cosine_pairs_df(d, 1000)),
        ("text_tfidf_cosine_pairs_exact", sizes_exact,
         lambda d: tfidf_cosine_pairs_df(d, None)),
        ("text_bpe_train_merges (6)", sizes,
         lambda d: (text_ops.bpe_train_merges(d, n_merges=6) and None)),
    ]

    docs_cache: dict[int, object] = {}
    rows = []
    for name, szs, fn in OPS:
        times = []
        for n in szs:
            if n not in docs_cache:
                docs_cache[n] = _make_docs(spark, n)
            d = docs_cache[n]
            t = min(_time(lambda: fn(d)) for _ in range(2))
            times.append(t)
            print(f"{name}  n={n}  {t:.2f}s", flush=True)
        slope = math.log(times[-1] / times[0]) / math.log(szs[-1] / szs[0])
        rows.append((name, szs, times, slope))

    # --- SemDeDup sub-split bound, clusters FORCED large (VERDICT r7 #1):
    # k=1 puts the whole corpus in one cluster, the worst case the cap
    # exists for. Uncapped the pair join is all-pairs (slope ~2); the
    # registered SEMDEDUP_MAX_CLUSTER sub-split must probe at-or-below
    # linear. Synthetic (vec_id, embedding) input, materialized before
    # timing like the docs corpora.
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.queries.llm_data10 import semantic_prune_df

    def _make_emb(n: int):
        e = (
            spark.range(0, n, 1, 32)
            .select(
                F.col("id").alias("vec_id"),
                F.array(
                    *[(F.rand(seed=7 * j + 1) * 2 - 1) for j in range(64)]
                ).alias("embedding"),
            )
            .localCheckpoint()
        )
        e.count()
        return e

    emb_cache: dict[int, object] = {}
    EMB_OPS = [
        ("dedup_semantic_prune (k=1, uncapped)", sizes_exact,
         lambda d: semantic_prune_df(d, max_cluster=None, k=1)),
        ("dedup_semantic_prune (k=1, max_cluster 50)", sizes,
         lambda d: semantic_prune_df(d, k=1)),
    ]
    for name, szs, fn in EMB_OPS:
        times = []
        for n in szs:
            if n not in emb_cache:
                emb_cache[n] = _make_emb(n)
            d = emb_cache[n]
            t = min(_time(lambda: fn(d)) for _ in range(2))
            times.append(t)
            print(f"{name}  n={n}  {t:.2f}s", flush=True)
        slope = math.log(times[-1] / times[0]) / math.log(szs[-1] / szs[0])
        rows.append((name, szs, times, slope))

    lines = [
        "# OPENVOCAB — text/dedup operator slopes on an open-vocabulary corpus",
        "",
        "Generated by `tools/openvocab_probe.py` (VERDICT r6 #2). Input is the",
        "`synthdocs` DataSource with `vocab_mode=open`: Zipf(s=1.5) rank draws",
        "rendered as base-26 words — vocabulary grows ~n^0.66 (Heaps' law) with",
        "a stable stop-term head, unlike the driver fixture's closed 31-token",
        "vocabulary (FIXTURES.md) where every token is a stop term. Inputs are",
        "localCheckpoint()ed before timing so rows measure the operator, not",
        "the Python-side generator. Slope = log-time ratio / log-size ratio",
        "between the end points; box noise is +-20% (SCALING.md header), so",
        "treat slopes within ~0.3 of 1.0 as linear.",
        "",
        "| operator | doc counts | times (s) | slope |",
        "|---|---|---|---|",
    ]
    for name, szs, times, slope in rows:
        lines.append(
            f"| {name} | {'/'.join(str(s) for s in szs)} | "
            f"{'/'.join(f'{t:.2f}' for t in times)} | {slope:.2f} |"
        )
    lines += [
        "",
        "Reading: the REGISTERED pruned tf-idf default must be at-or-near",
        "linear here; the exact twin stays super-linear on ANY corpus whose",
        "stop-term heads have df ~ O(N) — that is why the pruned form is the",
        "default (VERDICT r6 #1). The two MinHash rows measure the md5",
        "oracle-parity family against the xxhash64 100 TB default on identical",
        "input — the quantified family comparison VERDICT r6 #4 asked for.",
        "The two SemDeDup rows run on synthetic 64-dim embeddings with k=1",
        "(the whole corpus one cluster — the skew worst case): uncapped the",
        "intra-cluster join is all-pairs and must probe super-linear; the",
        "registered max_cluster sub-split must probe at-or-below linear",
        "(VERDICT r7 #1).",
        "",
    ]
    with open(os.path.join(REPO, "OPENVOCAB.md"), "w") as f:
        f.write("\n".join(lines))

    print(json.dumps({
        "rows": [
            {"op": n, "sizes": s, "times": [round(t, 3) for t in ts],
             "slope": round(sl, 2)}
            for n, s, ts, sl in rows
        ]
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
