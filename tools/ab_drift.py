"""Controlled same-session A/B of the r5->r6 uniform bench drift
(VERDICT r6 #6).

Most untouched headline queries moved +5-20% between BENCH_r05 and
BENCH_r06. Round 4 proved "uniform drift" can be real fixed overhead
(it was the missing warm-up pass), so this tool settles noise-vs-
overhead the only trustworthy way on this box (see memory + SCALING.md
header): ALTERNATING runs of the two code states in one wall-clock
session. Two git worktrees (round-5-final and round-6-final code),
each driven by a fresh subprocess that warms and then times the same
representative untouched queries; processes alternate A B A B ... so
any machine-state trend hits both sides equally.

Usage: python tools/ab_drift.py [refA refB [rounds]]
Defaults: A=06c28e9 (round-5 artifact commit), B=3c99e36 (round-6
artifact commit), 3 alternating rounds, 3 reps in-process.
Writes tools/ab_drift_log.md with per-side medians and the verdict.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: untouched-between-r5-and-r6 headline queries that drifted
QUERIES = ["etl_validation_split", "q1_pricing_summary", "window_topk_per_group"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from les_etl_pipeline_spark.queries import QUERIES as REG
from les_etl_pipeline_spark.session import get_spark
names = json.loads(sys.argv[2])
sf_dir = sys.argv[3]
reps = int(sys.argv[4])
spark = get_spark("ab-drift")
def run(n):
    t0 = time.time()
    REG[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0
for n in names:
    run(n)  # warm
out = {n: [] for n in names}
for _ in range(reps):
    for n in names:
        out[n].append(run(n))
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def _worktree(ref: str, base: str) -> str:
    path = os.path.join(base, f"wt_{ref}")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", path, ref],
        check=True, capture_output=True,
    )
    return path


def _run_side(path: str, sf_dir: str, reps: int) -> dict[str, list[float]]:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, path, json.dumps(QUERIES), sf_dir, str(reps)],
        capture_output=True, text=True, timeout=600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result from {path}:\n{proc.stderr[-2000:]}")


def main() -> int:
    ref_a = sys.argv[1] if len(sys.argv) > 1 else "06c28e9"
    ref_b = sys.argv[2] if len(sys.argv) > 2 else "3c99e36"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 3
    acc: dict[str, dict[str, list[float]]] = {
        ref_a: {n: [] for n in QUERIES}, ref_b: {n: [] for n in QUERIES}
    }
    with tempfile.TemporaryDirectory() as base:
        wa, wb = _worktree(ref_a, base), _worktree(ref_b, base)
        try:
            for r in range(rounds):
                for ref, path in ((ref_a, wa), (ref_b, wb)):
                    res = _run_side(path, sf_dir, reps)
                    for n, ts in res.items():
                        acc[ref][n].extend(ts)
                    print(f"round {r + 1} {ref}: "
                          + ", ".join(f"{n}={statistics.median(ts):.3f}"
                                      for n, ts in res.items()),
                          flush=True)
        finally:
            for path in (wa, wb):
                subprocess.run(
                    ["git", "-C", REPO, "worktree", "remove", "--force", path],
                    capture_output=True,
                )
    lines = [
        "# ab_drift — r5-code vs r6-code, alternating same-session runs",
        "",
        f"refs: A={ref_a} (round-5 final), B={ref_b} (round-6 final); "
        f"{rounds} alternating process rounds x {reps} in-process reps at "
        f"{sf_dir}; fresh JVM per process, per-process warm pass.",
        "",
        "| query | A median (s) | B median (s) | B/A |",
        "|---|---|---|---|",
    ]
    ratios = []
    for n in QUERIES:
        ma = statistics.median(acc[ref_a][n])
        mb = statistics.median(acc[ref_b][n])
        ratios.append(mb / ma)
        lines.append(f"| {n} | {ma:.3f} | {mb:.3f} | {mb / ma:.2f} |")
    mean_ratio = statistics.mean(ratios)
    if 0.85 <= mean_ratio <= 1.15:
        verdict = (
            "NOISE — same-session alternating medians agree within box "
            "variance; the r5->r6 BENCH drift was machine state, not code "
            "overhead."
        )
    elif mean_ratio > 1.15:
        verdict = (
            f"OVERHEAD — r6 code is uniformly {mean_ratio:.2f}x SLOWER than "
            "r5 on untouched queries; bisect the session/runtime change."
        )
    else:
        verdict = (
            f"IMPROVEMENT — r6 code is uniformly {mean_ratio:.2f}x of r5 "
            "(FASTER) on untouched queries, so the +5-20% drift recorded in "
            "BENCH_r06 was machine state masking a code-side gain, not "
            "overhead."
        )
    lines += ["", f"Mean B/A ratio: {mean_ratio:.2f}. Verdict: {verdict}", ""]
    log = os.path.join(REPO, "tools", "ab_drift_log.md")
    with open(log, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines[-3:]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
