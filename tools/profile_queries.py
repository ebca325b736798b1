"""Per-query phase profiler for the optimization rounds.

For each named query, separates the three costs the single bench number
hides (guide §1: decide WHERE the time goes before touching anything):

- build_s: Python-side query construction — includes any driver-side
  training loops / collects / eager checkpoints the query runs before it
  returns a DataFrame, plus analysis;
- exec1_s: first noop-sink execution of the returned frame;
- jobs: Spark jobs launched across build+exec (scheduler round-trips —
  each sequential job is ~0.1-0.5 s of fixed latency on a warm session);
- rebuild/exec medians over ``reps`` further full runs (build + exec,
  the same thing bench.run_one times).

Usage: python tools/profile_queries.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED, median  # noqa: E402
from les_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from les_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or [n for n in EXTENDED if n in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("profile")
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    out = {}
    for name in names:
        # warm (parquet footers, codegen)
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

        j0 = njobs()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        j1 = njobs()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j2 = njobs()

        totals = []
        for _ in range(reps):
            t3 = time.perf_counter()
            d = QUERIES[name](spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            totals.append(time.perf_counter() - t3)
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "exec1_s": round(t2 - t1, 3),
            "build_jobs": j1 - j0,
            "exec_jobs": j2 - j1,
            "total_med_s": round(median(totals), 3),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
