"""Scaling probe: run the headline queries at sf0.001 / sf0.01 / sf0.1
and report how runtime grows with data size.

The number that matters for a 100 TB extrapolation is the log-log slope
between sf0.01 and sf0.1 (a 10x data step on warm JVM/codegen):
slope ~ 0.0 means fixed overhead dominates at these sizes, ~ 1.0 is
linear scaling, > 1.2 flags super-linear growth worth a plan audit.
sf0.001 is measured but excluded from the slope (scheduler overhead
dominates sub-50ms runs).

Writes SCALING.md (markdown table) and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, median  # noqa: E402
from les_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from les_etl_pipeline_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
REPS = 3


def main() -> None:
    spark = get_spark("scale-probe")
    base = os.path.dirname(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/"))
    # headline set + the round-5 corpus heavies whose work grows with sf
    # (winnowing/recursive queries cap doc_id, so they would only
    # measure the cap, not scaling)
    extra = [
        "dedup_chunk_reconstruct",
        "text_bm25_topk",
        "sketch_cms_token_freq",
        "corpus_mixture_plan",
        "sketch_bitmap_exact_distinct",
        # round-6/7 additions; BOTH tfidf forms are probed HERE (the
        # exact twin is not benched — its all-pairs join is quadratic on
        # the closed-vocab fixture, see bench.py) so the pruned default's
        # slope and the exact twin's pinned super-linearity both stay
        # visible in SCALING.md
        "dedup_minhash_banded",
        "dedup_minhash_banded_xxhash",
        "text_tfidf_cosine_pairs",
        "text_tfidf_cosine_pairs_exact",
        "agg_exact_median_parallel",
        "stat_mannwhitney_u",
        "dedup_ngram_containment",
        "text_jsd_source_divergence",
        "text_gopher_quality_flags",
        "text_heaps_law_fit",
        "customer_rfm_segmentation",
        "part_affinity_lift",
        "events_time_weighted_avg",
        "agg_exact_quantiles_parallel",
        # round-7 curation pack (semantic prune runs on the fixed-size
        # embeddings table — its slope measures the text-side fixture
        # only for the doc-driven ops below)
        "dedup_semantic_prune",
        "decontaminate_bloom_prefilter",
        "dedup_url_canonical",
        "corpus_dsir_importance",
        "text_tokenizer_fertility",
        "etl_leakage_safe_split",
        # round-8: the ANN tier (VERDICT r7 #3) — training-dominated at
        # fixture scale, so the slope must show the fixed Lloyd cost
        # amortizing (sub-linear) as the vector table grows
        "similarity_bruteforce_topk",
        "similarity_ivf_topk",
        "similarity_pq_topk",
        "similarity_ivf_pq_topk",
        "similarity_hard_negatives",
        "similarity_hard_negatives_ivf",
        # round-8 pack 12: duplicated spans grows with corpus CHARS
        # (the one op whose shuffle is the char count), the JL
        # projection tracks the embeddings table, MMR is O(queries x
        # n_cand^2) so its slope should be ~flat, and the layout pack
        # tracks corpus rows
        "dedup_duplicated_spans",
        "embedding_random_projection_topk",
        "similarity_mmr_rerank",
        "corpus_global_shuffle",
        "text_ngram_novelty",
        "dedup_incremental_batch",
        # round-8 multimodal tier: one fixed-size synthetic asset per
        # doc, so the slope tracks doc count (decode + signature are
        # per-asset constants)
        "multimodal_image_near_dup",
        "multimodal_audio_near_dup",
        "multimodal_video_near_dup",
        "similarity_mmr_rerank_ivf",
        # round-9: the deterministic random-hyperplane LSH default —
        # hash-table build is linear in vectors, candidate volume is
        # T x n^2 / 2^bits, so the slope should sit near-linear on the
        # 4x embeddings step while staying far under the exact
        # threshold_pairs quadratic
        "similarity_lsh_buckets",
        # round-9 sketch/dedup pack: MG heavy hitters and the histogram
        # quantile sketch are single-scan + bounded-state (slope ~ scan
        # cost); the prefix-filtered Jaccard join should track the
        # capped default's slope while staying lossless
        "sketch_heavy_hitters_exact",
        "sketch_histogram_quantiles",
        "dedup_jaccard_prefix_filter",
        # round-10: the KLL-family rank sketch — one scan computing 61
        # conditional counts + a <= capacity survivor filter, so the
        # slope should track scan cost like the other bounded-state
        # sketches — and the KMV overlap report, whose per-pair work is
        # bounded by k so the slope should track the shingle scan
        "sketch_kll_quantiles",
        "sketch_kmv_source_overlap",
        # round-11: the merge-fold paths — three asymmetric shard builds
        # left-folded (KLL) and a two-shard two-phase KMV merge; each
        # stage is bounded-state, so slopes should track scan cost like
        # the single-build sketches they replay
        "sketch_kll_merge_fold",
        "sketch_kll_merge_fold_by_group",
        "sketch_kmv_merge_fold",
        # round-11 percentile tier: scoring is a per-row expression over
        # a literal/broadcast cut array — slopes should be pure scan cost
        "sketch_percentile_normalize",
        "sketch_percentile_normalize_by_group",
        # round-11 session 2: the two-phase local-prune rewrites (skyline
        # and hot-group top-k fold partials on scan partitions — slope =
        # scan cost), the carried-CDF weighted quantiles (value-grain
        # CDF, same shape as the unweighted parallel quantiles), the
        # exact-moment OLS (one grouped aggregate), and the pane-merged
        # sliding sketches (per-day builds + bounded pane merges — the
        # window count is the calendar, so slopes track the daily scan)
        "skyline_price_size",
        "skyline_price_size_by_brand",
        "scale_topk_per_group_two_phase",
        "agg_weighted_quantiles_exact",
        "agg_ols_two_features",
        "sketch_kmv_sliding_distinct",
        "sketch_kll_sliding_quantiles",
        # round-11 session-2 late additions (first slopes land with the
        # next probe run): quota reservoir is two-phase-topk-shaped,
        # sliding HH is one counting scan + bounded pane sums
        "sample_weighted_per_group",
        "sketch_heavy_hitters_sliding",
        # round-12 queue (VERDICT r11 #3): grouped carried-CDF weighted
        # quantiles and the winsorized mean share the value-grain CDF
        # shape, the directed KMV difference is the overlap report's
        # sibling, and the d=3 skylines fold bounded partials on scan
        # partitions — all slopes should track scan cost
        "agg_weighted_quantiles_by_group",
        "agg_winsorized_mean_by_flag",
        "sketch_kmv_source_difference",
        "skyline_quality_3d",
        "skyline_quality_3d_by_lang",
        # round-12: calendar-grain gap-fill — everything after the daily
        # aggregate is series x days rows, so the slope should be pure
        # scan cost of the one raw aggregate
        "events_gapfill_locf_interp",
        # round-12: two carried-CDF lower-median passes on the value grain
        # — slope should match the grouped weighted quantiles it composes
        "agg_mad_outliers_by_flag",
        # round-12: bigram-grain model build + scoring joins — slope
        # should track the bigram explode (linear in corpus tokens)
        "text_bigram_logprob_interp",
        # round-12 analytics trio: user/cohort-keyed shuffles only
        "events_retention_cohorts",
        "events_type_transitions",
        "events_funnel_conversion",
    ]
    names = [n for n in HEADLINE if n in QUERIES]
    names += [n for n in extra if n in QUERIES and n not in names]
    # warm codegen/JVM on every sf dir once
    for sf in SFS:
        QUERIES["q1_pricing_summary"](spark, f"{base}/sf{sf}").write.format(
            "noop"
        ).mode("overwrite").save()

    def _drop_persisted() -> None:
        # localCheckpoint RDDs from checkpoint-heavy queries accumulate
        # across the sweep and thrash storage memory, inflating later
        # measurements by 2x+ (observed on dedup_ngram_jaccard: 1.8 s
        # isolated vs 4.3 s late in a sweep). Dropping them between
        # measurements isolates each query's own cost.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    times: dict[str, dict[str, list[float]]] = {
        n: {sf: [] for sf in SFS} for n in names
    }
    for _ in range(REPS):
        for sf in SFS:
            sf_dir = f"{base}/sf{sf}"
            for n in names:
                _drop_persisted()
                t0 = time.time()
                QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[n][sf].append(time.time() - t0)

    # embeddings-driven queries: the vector table grows 4x (500 -> 2000)
    # between sf0.01 and sf0.1, not 10x like documents/lineitem —
    # normalize their slope by log10(4) so 1.0 still reads "linear in
    # data" across the whole table
    emb_queries = {
        "dedup_semantic_prune",
        "similarity_bruteforce_topk",
        "similarity_ivf_topk",
        "similarity_pq_topk",
        "similarity_ivf_pq_topk",
        "similarity_hard_negatives",
        "similarity_hard_negatives_ivf",
    }
    rows = []
    for n in names:
        med = {sf: median(times[n][sf]) for sf in SFS}
        denom = math.log10(4.0) if n in emb_queries else 1.0
        slope = (
            math.log10(max(med["0.1"], 1e-4) / max(med["0.01"], 1e-4)) / denom
        )
        rows.append((n, med, slope))

    lines = [
        "# SCALING — measured runtime growth vs data size",
        "",
        "Medians of %d warm reps per (query, sf) on local[32]. `slope` is" % REPS,
        "log10(t_sf0.1 / t_sf0.01) over log10(data growth) — 10x for the",
        "documents/TPC-H tables, 4x (500 -> 2000 vectors) for the",
        "embeddings-driven similarity/semantic-prune rows: ~0 = overhead-bound,",
        "1.0 = linear, >1.2 = super-linear (plan audit warranted). Generated by",
        "`tools/scale_probe.py`.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | slope |",
        "|---|---|---|---|---|",
    ]
    for n, med, slope in sorted(rows, key=lambda r: -r[2]):
        lines.append(
            f"| {n} | {med['0.001']:.3f} | {med['0.01']:.3f} | {med['0.1']:.3f} | {slope:.2f} |"
        )
    worst = max(rows, key=lambda r: r[2])
    lines += [
        "",
        f"Worst slope: `{worst[0]}` at {worst[2]:.2f} "
        "(1.0 = linear; at-or-below-linear scaling supports the 100x "
        "extrapolation argument — shuffles and scans grow with data, no "
        "unexplained quadratic blowups).",
        "",
        "Known super-linear entry: `text_tfidf_cosine_pairs_exact` is "
        "quadratic BY FIXTURE CONSTRUCTION — the synthetic corpus has a "
        "CLOSED ~31-token vocabulary at every sf, so the exact all-pairs "
        "token join grows as sum(df^2) ~ n_docs^2 (real corpora grow their "
        "vocabulary, Heaps' law). The REGISTERED `text_tfidf_cosine_pairs` "
        "default applies the absolute max_df=1000 vocabulary cap (VERDICT r6 #1; the fractional 0.5 cap was measured super-linear and rejected, OPENVOCAB.md) and "
        "must probe at-or-below linear. The exact twin is kept in the probe "
        "deliberately so the cost stays visible; excluded from bench.py's "
        "timed suite for the same reason (see bench.py comment).",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write("\n".join(lines))

    print(
        json.dumps(
            {
                "metric": "scaling_slopes",
                "slopes": {n: round(s, 3) for n, _m, s in rows},
                "worst": {"query": worst[0], "slope": round(worst[2], 3)},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
