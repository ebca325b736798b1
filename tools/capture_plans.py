"""Capture `.explain("formatted")` output for named queries into text
files — the round-14 optimization evidence trail (plans/r14/<q>_<tag>.txt).

Planning only (no execution; with AQE the text is the isFinalPlan=false
initial plan, which is the right artifact for plan-shape claims: Exchange
count, join strategy, PushedFilters, BatchEvalPython nodes).

Usage: python tools/capture_plans.py <tag> [query ...]
  tag        suffix for the output files (e.g. "before", "after")
  query ...  names from the registry; default = the bench HEADLINE+EXTENDED
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED, HEADLINE  # noqa: E402
from les_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from les_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n in HEADLINE + EXTENDED if n in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
