"""Session-aging experiment (guide §1: measure first, §7: debug playbook).

The r14 baseline showed compute-bound queries run 2-4x slower inside the
long bench session (4 passes x 36 queries) than on a fresh warm session.
This probe replicates the bench's execution pattern while sampling JVM
telemetry each pass — JIT code-cache pools, metaspace, loaded classes,
total JIT compilation time, GC time — so the aging cause is measured, not
guessed.

Usage:
  SPARK_GRAFT_AGING_JAVAOPTS='-XX:ReservedCodeCacheSize=1g' \
  SPARK_GRAFT_AGING_CONF='spark.sql.codegen.cache.maxEntries=2000' \
      python tools/aging_probe.py [passes]

Prints one JSON line per pass: per-probe-query seconds + telemetry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED, HEADLINE  # noqa: E402
from les_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from les_etl_pipeline_spark.session import get_spark  # noqa: E402

PROBES = [
    "similarity_bruteforce_topk",
    "text_bm25_topk",
    "dedup_ngram_jaccard",
    "dedup_minhash_banded_xxhash",
    "text_quality_score",
    "q1_pricing_summary",
]


def telemetry(spark) -> dict:
    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out: dict = {}
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        name = p.getName()
        if "Code" in name or "Metaspace" in name:
            u = p.getUsage()
            out[name.replace("'", "")] = {
                "used_mb": round(u.getUsed() / 2**20, 1),
                "max_mb": round(u.getMax() / 2**20, 1),
            }
    out["classes_loaded"] = mf.getClassLoadingMXBean().getLoadedClassCount()
    out["jit_ms_total"] = mf.getCompilationMXBean().getTotalCompilationTime()
    gcs = mf.getGarbageCollectorMXBeans()
    out["gc_ms_total"] = sum(gcs.get(i).getCollectionTime() for i in range(gcs.size()))
    return out


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    javaopts = os.environ.get("SPARK_GRAFT_AGING_JAVAOPTS", "")
    extra: dict[str, str] = {}
    if javaopts:
        extra["spark.driver.extraJavaOptions"] = javaopts
    for kv in os.environ.get("SPARK_GRAFT_AGING_CONF", "").split(";"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            extra[k.strip()] = v.strip()
    spark = get_spark("aging_probe", extra_conf=extra or None)
    names = [n for n in HEADLINE + EXTENDED if n in QUERIES]
    for p in range(passes):
        probe_times: dict[str, float] = {}
        t_pass = time.perf_counter()
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if name in PROBES:
                probe_times[name] = round(time.perf_counter() - t0, 3)
        rec = {
            "pass": p,
            "pass_s": round(time.perf_counter() - t_pass, 2),
            "probes": probe_times,
            "jvm": telemetry(spark),
            "javaopts": javaopts,
        }
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
