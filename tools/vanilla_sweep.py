"""Run every registered query on a VANILLA SparkSession.

The driver's correctness harness uses a stock Spark-4 session — ANSI mode
on, default shuffle partitions, no legacy confs. Two rounds of failures
came from queries that only worked under the builder's tuned session
(nanosAsLong in r1, ANSI casts in r2), so this sweep is the regression
gate: every query must run to completion with ZERO custom SQL confs.

Usage: python tools/vanilla_sweep.py [sf_dir] [name ...]
Prints one line per query and exits non-zero if any query raises.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Deliberately bare: master + memory only (resources, not semantics).
    # No ANSI override, no shuffle sizing, no legacy confs.
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("vanilla_sweep")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.ansi.enabled") == "true", (
        "sweep must run with ANSI on (Spark 4 default); got a tuned session"
    )

    from les_etl_pipeline_spark.queries import QUERIES

    failures: list[str] = []
    names = [n for n in QUERIES if not only or n in only]

    # the ~320 sf0.001 queries are each dominated by fixed per-job
    # scheduler/driver latency, not compute — run them from a small
    # driver thread pool so independent jobs overlap (guide §2.6:
    # Spark's scheduler runs concurrent jobs fine; FIFO back-fills the
    # tail). Results are unaffected: every query builds its own frame
    # (scratch fixtures use unique tempdirs) and the pass/fail record is
    # collected under a lock. 6 in flight measured ~3.5x on the sweep.
    from concurrent.futures import ThreadPoolExecutor
    from threading import Lock

    lock = Lock()

    def run_one(name: str) -> None:
        t0 = time.monotonic()
        try:
            df = QUERIES[name](spark, sf_dir)
            n_rows = len(df.collect())
            with lock:
                print(
                    f"ok   {name}  rows={n_rows}  {time.monotonic() - t0:.2f}s",
                    flush=True,
                )
        except Exception:
            with lock:
                failures.append(name)
                print(f"FAIL {name}", flush=True)
                traceback.print_exc()

    n_threads = int(os.environ.get("SPARK_GRAFT_SWEEP_THREADS", "6"))
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        list(pool.map(run_one, names))
    print(f"\n{len(names) - len(failures)}/{len(names)} queries green on vanilla session")
    if failures:
        print("failed:", ", ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
