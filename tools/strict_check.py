"""Bit-exact Spark-vs-DuckDB compare — a STRICTER stand-in for the
driver's value-hash gate than tools/check_correctness.py (whose last-ulp
float tolerance is right for distinguishing logic errors from noise, but
can mask type mismatches and sub-ulp drift the driver's exact hash would
flag — this caught agg_stat_moments returning double where the oracle
cast BIGINT).

Floats compare by repr() (exact bits), everything else by value; columns
sorted by name, rows order-insensitively, mirroring the driver.

Usage:
  python tools/strict_check.py              # queries never driver-graded
  python tools/strict_check.py --all        # every oracle-paired query
  python tools/strict_check.py q1 q2 ...    # explicit subset
  python tools/strict_check.py --all --json STRICT_r12.json
      # additionally write the per-query artifact committed each round
      # (VERDICT r11 #1): the registry-wide bit-exact gate complementing
      # the driver's 50-query sampled window, so the grade-staleness
      # tail is covered by a committed file instead of a judge re-run.
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from les_etl_pipeline_spark.queries import ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _targets(argv: list[str]) -> list[str]:
    if argv and argv[0] != "--all":
        return argv  # (--json is stripped by main before this runs)
    names = [n for n in sorted(QUERIES) if n in ORACLES]
    if argv and argv[0] == "--all":
        return names
    graded: set[str] = set()
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            graded |= set(json.load(open(p)))
        except (OSError, json.JSONDecodeError):
            continue
    return [n for n in names if n not in graded]


def _norm(v):
    import decimal

    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"  # a DECIMAL result will NOT hash like a double —
        # surface oracle typing drift (CASE over 0.5 literals is DECIMAL)
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def main() -> int:
    from les_etl_pipeline_spark.session import get_spark

    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("error: --json requires an output path", file=sys.stderr)
            return 2
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    # the artifact must say WHAT was checked: a bare `--json out.json`
    # runs only the never-driver-graded residue, which would otherwise
    # masquerade as a registry-wide gate when committed.
    target_mode = (
        "all" if argv[:1] == ["--all"] else "explicit" if argv else "ungraded-residue"
    )
    targets = _targets(argv)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark("strict-check", shuffle_partitions=32)
    fails: list[tuple[str, str]] = []
    results: dict[str, dict] = {}
    for name in targets:
        try:
            sdf = QUERIES[name](spark, SF_DIR)
            scols = sdf.columns
            sorder = sorted(range(len(scols)), key=lambda i: scols[i])
            s = sorted(
                [tuple(_norm(r[i]) for i in sorder) for r in sdf.collect()], key=str
            )
            res = con.execute(ORACLES[name])
            ocols = [d[0] for d in res.description]
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            o = sorted(
                [tuple(_norm(r[i]) for i in oorder) for r in res.fetchall()], key=str
            )
            if sorted(scols) != sorted(ocols):
                why = f"schema {sorted(scols)} vs {sorted(ocols)}"
                fails.append((name, why))
                results[name] = {"rows": len(s), "exact": False, "why": why}
                print(f"SCHEMA {name}")
            elif s != o:
                n = sum(1 for a, b in zip(s, o) if a != b) + abs(len(s) - len(o))
                fails.append((name, f"{n} rows differ"))
                results[name] = {
                    "rows": len(s),
                    "exact": False,
                    "why": f"{n} rows differ",
                }
                print(f"DIFF   {name}: {n} of {max(len(s), len(o))} rows")
                for a, b in zip(s, o):
                    if a != b:
                        print(f"  spark: {a}\n  duck : {b}")
                        break
            else:
                results[name] = {"rows": len(s), "exact": True}
                print(f"exact  {name}  rows={len(s)}")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append((name, str(e)[:120]))
            results[name] = {"rows": None, "exact": False, "why": str(e)[:120]}
            print(f"ERROR  {name}: {str(e)[:120]}")
    print(f"\n{len(targets) - len(fails)} exact, {len(fails)} strict-fails")
    for name, why in fails:
        print(f"  {name}: {why}")
    if json_path:
        artifact = {
            "sf_dir": SF_DIR,
            "target_mode": target_mode,
            "registry_wide": target_mode == "all",
            "n_checked": len(targets),
            "n_exact": len(targets) - len(fails),
            "n_fails": len(fails),
            "queries": results,
        }
        with open(json_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
