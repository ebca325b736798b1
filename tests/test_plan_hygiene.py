"""Plan-hygiene gate over the ENTIRE query registry: no scale-killer
shapes may appear in any registered query's physical plan unless
explicitly justified below.

At 100 TB a BroadcastNestedLoopJoin or CartesianProduct on data-scale
inputs is the difference between a job and an outage, and an
UNPARTITIONED window (WindowExec "No Partition Defined") sorts its whole
input in one task. This test makes their absence a permanent invariant —
a new query that accidentally plans one fails CI with its name.
"""

from __future__ import annotations

import re

import pytest

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
    "text_tfidf_cosine_pairs_exact": "1-row doc-count aggregate broadcast",
    "events_weekday_seasonality": "1-row overall-mean aggregate broadcast",
    "text_bm25_topk": "1-row avgdl/n_docs aggregate broadcast",
    "corpus_mixture_plan": "1-row n_sources aggregate broadcast",
    "events_psi_drift": "1-row bucket-totals aggregate broadcast",
    "stat_chi_squared_independence": "1-row grand-total aggregate broadcast",
    "agg_exact_median_parallel": "1-row total-count aggregate broadcast",
    "agg_exact_quantiles_parallel": "1-row total-count aggregate broadcast",
    "stat_ks_two_sample": "1-row group-sizes aggregate broadcast",
    "events_changepoint_cusum": "1-row global-mean + day-count broadcasts",
    "text_jsd_source_divergence": "source-pair spine cross (sources = corpus metadata)",
    "part_affinity_lift": "1-row order-count aggregate broadcast",
    "customer_pareto_concentration": "1-row revenue-total aggregate broadcast",
    "agg_trimmed_mean_exact": "1-row trim-window aggregate broadcast",
    "decontaminate_bloom_prefilter": "1-row 16 KiB Bloom-bitmap broadcast",
    "corpus_dsir_importance": "1-row token-totals aggregate broadcast",
    "similarity_hard_negatives": "bounded broadcast of the small query set",
    "similarity_hard_negatives_ivf": "bounded query x n_cells centroid fan-out (broadcast)",
    "embedding_random_projection_topk": "bounded broadcast of the small query set",
    "similarity_mmr_rerank": "bounded broadcast of the small query set",
    "similarity_mmr_rerank_ivf": "bounded query x n_cells centroid fan-out (broadcast)",
}

#: queries allowed ordered-UNPARTITIONED windows: per query, a list of
#: (leading order column, reason) entries — one entry per DISTINCT
#: exempt window spec, each justified by its input being metadata-scale
#: (a bounded spine or a one-row-per-group table, never raw data rows).
#: The gate additionally requires the number of distinct non-`_pid`
#: unpartitioned specs per query to equal the entry count, so a future
#: second window that happens to reuse an exempted leading column still
#: fails by name. Windows ordered by `_pid` are always allowed: that is
#: the carried-offset cumulation of scale.global_row_ids / exact_ntile —
#: ONE row per range partition, the sanctioned parallel-rank pattern.
UNPART_WINDOW_ALLOWED = {
    "cte_nation_revenue_rank": [("rev", "rank over the 25-row per-nation aggregate")],
    "events_autocorr_lag1": [("day", "lag over the one-row-per-day aggregate")],
    "events_linear_interpolation": [
        ("hrL", "forward-fill (last non-null before) over the bounded hourly spine"),
        ("hrL", "backward-fill (first non-null after) over the bounded hourly spine"),
    ],
    "events_max_concurrency": [("day", "carried-offset cumulation, one row per day")],
    "events_sliding_distinct_users": [("_w1", "day-grain sliding frame")],
    "events_changepoint_cusum": [("day", "CUSUM over the one-row-per-day table")],
}

_WSD_START = "windowspecdefinition("


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir) -> dict[str, str]:
    """Physical plan text of every registered query, computed once."""
    return {
        name: fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for name, fn in QUERIES.items()
    }


def _wsd_args(plan: str) -> list[list[str]]:
    """Top-level argument lists of every windowspecdefinition in the
    plan text, parsed with balanced parens — a naive [^)]* regex stops
    at the first ')' and a bare comma split breaks on nested calls like
    coalesce(a, b), silently exempting such windows from the gate."""
    specs = []
    i = 0
    while True:
        start = plan.find(_WSD_START, i)
        if start < 0:
            break
        j = start + len(_WSD_START)
        depth, arg, args = 1, [], []
        while j < len(plan) and depth > 0:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                args.append("".join(arg).strip())
                arg = []
                j += 1
                continue
            arg.append(ch)
            j += 1
        if arg:
            args.append("".join(arg).strip())
        specs.append(args)
        i = j + 1
    return specs


def _unpartitioned_windows(plan: str) -> list[tuple[str, str]]:
    """(leading order expression, full spec) for every
    windowspecdefinition with NO partition columns (the first top-level
    argument already carries a sort direction)."""
    out = []
    for args in _wsd_args(plan):
        first = args[0] if args else ""
        if first.endswith(("ASC NULLS FIRST", "ASC NULLS LAST",
                           "DESC NULLS FIRST", "DESC NULLS LAST")):
            lead = re.sub(r"#\d+", "", first).split(" ")[0]
            out.append((lead, re.sub(r"#\d+", "", ", ".join(args))))
    return out


def test_no_unjustified_nested_loops(all_plans):
    offenders: dict[str, list[str]] = {}
    for name, plan in all_plans.items():
        hits = []
        if "CartesianProduct" in plan:
            hits.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            hits.append("BroadcastNestedLoopJoin")
        if hits:
            offenders[name] = hits
    assert not offenders, f"scale-killer join shapes: {offenders}"


def test_no_unjustified_unpartitioned_windows(all_plans):
    """Every ordered-unpartitioned window in every registered plan must
    be the `_pid` carried-offset cumulation or a justified metadata-scale
    spine — a data-scale single-task sort fails here by query name."""
    offenders: dict[str, list[str]] = {}
    for name, plan in all_plans.items():
        allowed_leads = [lead for lead, _ in UNPART_WINDOW_ALLOWED.get(name, [])]
        distinct_specs: dict[str, set[str]] = {}
        for lead, spec in _unpartitioned_windows(plan):
            if lead == "_pid":
                continue
            if lead in allowed_leads:
                distinct_specs.setdefault(lead, set()).add(spec)
                continue
            offenders.setdefault(name, []).append(spec)
        # one justified entry covers exactly ONE distinct window spec: a
        # second window reusing an exempted leading column must be
        # justified (or rejected) on its own, not ride the existing entry
        for lead, specs in distinct_specs.items():
            n_entries = allowed_leads.count(lead)
            if len(specs) > n_entries:
                offenders.setdefault(name, []).append(
                    f"{len(specs)} distinct specs lead by '{lead}' but only "
                    f"{n_entries} justified: {sorted(specs)}"
                )
    assert not offenders, f"unpartitioned data-scale windows: {offenders}"


def test_concurrency_sweep_is_sharded(all_plans):
    """The events_max_concurrency sweep-line must keep its data-scale
    running sum partitioned by day: the window over the event point
    stream (the one summing `delta` ordered by t) must carry a partition
    spec, and the only ordered-unpartitioned window allowed is the
    carried-offset cumulation over the one-row-per-day table (summing
    `day_net`). Guards against regressing to a single-task global sort
    of every event boundary."""
    plan = all_plans["events_max_concurrency"]
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


def test_allowlist_entries_exist():
    """Allowlist entries must name real queries — a renamed query must
    carry its justification along."""
    unknown = [n for n in BNLJ_ALLOWED if n not in QUERIES]
    unknown += [n for n in UNPART_WINDOW_ALLOWED if n not in QUERIES]
    assert not unknown, f"allowlisted but not registered: {unknown}"
