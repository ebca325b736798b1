"""Physical-plan linter: every registered query's executed plan is
checked for the anti-patterns that kill a job at 100 TB even when it
passes at test scale.

Rules (per query, against the AQE-final executed plan at sf0.01):
  nested_loop   BroadcastNestedLoopJoin / CartesianProduct — quadratic
                compare loops; allowed only where the semantics ARE a
                cross product (join_cross) or a deliberate exact-baseline
                quadratic operator (threshold pairs / brute-force cosine,
                which exist as oracles for the LSH/IVF scale tiers).
  python_eval   BatchEvalPython (row-at-a-time Python UDF) — never
                allowed; ArrowEvalPython/mapInPandas appear only in
                queries on the declared Python-boundary list.
  scan_width    parquet scans must not read every column of a wide table
                when the query projects a narrow result (column pruning
                broken). Checked as: lineitem scans read <= 8 of its 11
                columns unless the query is on the wide-scan allowlist.

Output: one JSON line per failure + a summary; exit 1 on any failure.
Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from les_etl_pipeline_spark.plans import unbounded_bnljs  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

# quadratic by declared design (exact baselines for approximate scale
# tiers), plus the scalar-subquery pattern: a condition-less join against
# a 1-row (or n_cells-row) aggregate/centroid side plans as a BNLJ whose
# "loop" runs once per row over a broadcast of O(1) rows — constant work,
# not quadratic; Spark compiles SQL scalar subqueries the same way.
# Round 11: the BNLJ rule now uses the SAME structural recognizer as
# the enforced gate (tests/test_plan_hygiene.py, via
# les_etl_pipeline_spark.plans.unbounded_bnljs): a BNLJ whose build
# side is provably bounded (1-row global aggregate, driver-literal
# table, constant Range, compositions) passes without bookkeeping.
# Only genuinely data-derived or deliberately-quadratic builds need a
# named entry here — keep this in sync with the gate's BNLJ_ALLOWED.
ALLOW_NESTED_LOOP = {
    "join_cross",               # semantics are the cross product
    "similarity_threshold_pairs",   # documented exact all-pairs baseline
    "text_jsd_source_divergence",   # source-pair spine cross (corpus metadata)
    "similarity_bruteforce_topk",   # broadcast of the predicate-bounded query set
    "similarity_hard_negatives",    # broadcast of the predicate-bounded query set
    "embedding_random_projection_topk",  # broadcast of the predicate-bounded query set
    "events_hourly_gapfill",    # hourly spine x distinct event types
    "dedup_embedding_cosine",       # uses threshold_pairs as pair source
}

# queries whose operator IS an Arrow/pandas boundary (vectorized
# mapInPandas/ArrowEvalPython by design — the MG partial fold, the
# two-phase KMV bottom-k partial, binary decode, the sanctioned
# transliteration pandas UDF); everything else must stay JVM-only
ALLOW_ARROW = {
    "scalar_transliterate",
    "multimodal_binary_features",
    "multimodal_byte_chunks",
    "multimodal_decode_stdlib",
    "multimodal_image_near_dup",
    "multimodal_audio_near_dup",
    "multimodal_video_near_dup",
    "sketch_heavy_hitters_exact",   # Misra-Gries per-partition fold
    "sketch_kmv_source_overlap",    # two-phase bottom-k partial fold
    "sketch_kmv_merge_fold",        # two-phase bottom-k partial fold
}

# queries whose operator IS a Python UDTF (a deliberate SURVEY §2.12
# surface feature — lateral table functions execute as BatchEvalPython
# by construction); everything else must stay off the row-at-a-time path
ALLOW_BATCH_EVAL = {
    "udtf_word_chunks",
}

# queries that genuinely consume (nearly) all lineitem columns
ALLOW_WIDE_LINEITEM = {
    "q1_pricing_summary",  # 7 cols + groupBy keys
    "distinct_projection",
    "scale_salted_agg",    # salt hashes every column by design
}

LINEITEM_MAX_COLS = 8


def audit_one(spark, name: str, fn) -> list[dict]:
    failures: list[dict] = []
    try:
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception as e:  # noqa: BLE001
        return [{"query": name, "rule": "build_error", "detail": str(e)[:200]}]

    if name not in ALLOW_NESTED_LOOP:
        if "CartesianProduct" in plan:
            failures.append(
                {"query": name, "rule": "nested_loop", "detail": "CartesianProduct"}
            )
        for node in unbounded_bnljs(plan):
            failures.append(
                {"query": name, "rule": "nested_loop", "detail": node[:120]}
            )
    if name not in ALLOW_BATCH_EVAL and "BatchEvalPython" in plan:
        failures.append({"query": name, "rule": "python_eval", "detail": "BatchEvalPython"})
    if name not in ALLOW_ARROW and (
        "ArrowEvalPython" in plan or "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan
    ):
        failures.append({"query": name, "rule": "python_eval", "detail": "Arrow op outside allowlist"})

    if name not in ALLOW_WIDE_LINEITEM:
        for m in re.finditer(r"FileScan parquet \[([^\]]*)\][^\n]*lineitem", plan):
            cols = [c for c in m.group(1).split(",") if c.strip()]
            if len(cols) > LINEITEM_MAX_COLS:
                failures.append(
                    {
                        "query": name,
                        "rule": "scan_width",
                        "detail": f"lineitem scan reads {len(cols)} columns",
                    }
                )
    return failures


def main() -> None:
    from les_etl_pipeline_spark.queries import QUERIES
    from les_etl_pipeline_spark.session import get_spark

    names = sys.argv[1:] or list(QUERIES)
    spark = get_spark("plan_audit", shuffle_partitions=8)
    all_failures: list[dict] = []
    for name in names:
        fails = audit_one(spark, name, QUERIES[name])
        for f in fails:
            print(json.dumps(f))
        all_failures.extend(fails)
    print(f"{len(names) - len({f['query'] for f in all_failures})} clean, "
          f"{len({f['query'] for f in all_failures})} flagged of {len(names)}")
    spark.stop()
    sys.exit(1 if all_failures else 0)


if __name__ == "__main__":
    main()
