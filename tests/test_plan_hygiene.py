"""Plan-hygiene gate over the ENTIRE query registry: no scale-killer
join shapes may appear in any registered query's physical plan unless
explicitly justified below.

At 100 TB a BroadcastNestedLoopJoin or CartesianProduct on data-scale
inputs is the difference between a job and an outage; this test makes
the absence a permanent invariant — a new query that accidentally plans
one fails CI with its name.
"""

from __future__ import annotations

from les_etl_pipeline_spark.queries import QUERIES

#: queries allowed to plan a BroadcastNestedLoopJoin, each with the reason
#: it is scale-safe (1-row scalar broadcasts and bounded fan-outs) or
#: deliberately quadratic (exactness baselines, the cross-join query).
BNLJ_ALLOWED = {
    "join_cross": "the cross-join operator itself",
    "similarity_threshold_pairs": "documented exact all-pairs baseline",
    "vocab_doc_frequency": "1-row corpus-size aggregate broadcast",
    "q11_value_concentration": "1-row threshold aggregate broadcast",
    "q22_dormant_accounts": "1-row scalar avg-balance subquery broadcast",
    "events_hourly_gapfill": "1-row min/max spine aggregate broadcast",
    "stream_late_data_cutoff": "1-row max-event-time cutoff broadcast",
    "similarity_ivf_topk": "bounded query x n_cells centroid fan-out (broadcast)",
    "similarity_ivf_pq_topk": "bounded query x n_cells centroid fan-out (broadcast)",
    "similarity_bruteforce_topk": "bounded broadcast of the small query set",
    "graph_triangle_count": "cross of three 1-row summary aggregates",
    "text_unigram_logprob": "1-row corpus-token-total aggregate broadcast",
    "corpus_ppl_bucket_sampling": "1-row corpus-token-total aggregate broadcast",
    "text_tfidf_cosine_pairs": "1-row doc-count aggregate broadcast",
    "events_weekday_seasonality": "1-row overall-mean aggregate broadcast",
    "text_bm25_topk": "1-row avgdl/n_docs aggregate broadcast",
    "corpus_mixture_plan": "1-row n_sources aggregate broadcast",
    "events_psi_drift": "1-row bucket-totals aggregate broadcast",
    "stat_chi_squared_independence": "1-row grand-total aggregate broadcast",
}


def test_no_unjustified_nested_loops(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = []
        if "CartesianProduct" in plan:
            hits.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            hits.append("BroadcastNestedLoopJoin")
        if hits:
            offenders[name] = hits
    assert not offenders, f"scale-killer join shapes: {offenders}"


def test_concurrency_sweep_is_sharded(spark, sf_dir):
    """The events_max_concurrency sweep-line must keep its data-scale
    running sum partitioned by day: the window over the event point
    stream (the one summing `delta` ordered by t) must carry a partition
    spec, and the only ordered-unpartitioned window allowed is the
    carried-offset cumulation over the one-row-per-day table (summing
    `day_net`). Guards against regressing to a single-task global sort
    of every event boundary."""
    import re

    from les_etl_pipeline_spark.queries import QUERIES

    df = QUERIES["events_max_concurrency"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    stream_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "sum(delta" in ln
    ]
    assert stream_windows, "sweep window over the point stream not found"
    for ln in stream_windows:
        assert re.search(r"windowspecdefinition\(day#\d+, t#", ln), (
            f"point-stream window is not partitioned by day: {ln.strip()}"
        )
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln and "sum(delta" not in ln:
            assert "day_net" in ln, (
                f"unexpected unpartitioned window over data-scale input: {ln.strip()}"
            )


def test_bnlj_allowlist_entries_exist():
    """Allowlist entries must name real queries — a renamed query must
    carry its justification along."""
    unknown = [n for n in BNLJ_ALLOWED if n not in QUERIES]
    assert not unknown, f"allowlisted but not registered: {unknown}"
