"""Accuracy bounds for the rows-only approximate queries.

The driver cannot oracle-check sketch results (CORRECTNESS records them
as no_oracle), so the repo bounds them here instead, driving the SAME
registered queries the driver grades:

- agg_approx_count_distinct: HyperLogLog++ at rsd=0.01 — estimate within
  5x the configured relative standard deviation of the exact per-group
  count (≈5 sigma; HLL++'s published error is the rsd parameter).
- agg_approx_percentiles: GK/KLL-style percentile_approx at
  accuracy=10000 — the published guarantee is a RANK error of at most
  N/accuracy, and the returned value is an element of the group, so the
  bound is checked in rank space per group and percentile.

Mirrors the recall bound pattern of tests/test_similarity_ivf.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.queries import QUERIES


def test_approx_count_distinct_bounds_per_group(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in QUERIES["agg_approx_count_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, ex in exact.items():
        rel_err = abs(approx[k] - ex) / ex
        assert rel_err <= 5 * 0.01, f"group {k}: rel err {rel_err:.4f} > 5*rsd"


def test_approx_percentiles_rank_bounds(spark, sf_dir):
    out = {
        r["l_returnflag"]: (r["p50"], r["p95"], r["p99"])
        for r in QUERIES["agg_approx_percentiles"](spark, sf_dir).collect()
    }
    groups = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sort_array(F.collect_list("l_extendedprice")).alias("vals"))
        .collect()
    )
    accuracy = 10000  # matches the registered query
    for row in groups:
        vals = row["vals"]
        n = len(vals)
        tol = n / accuracy + 1  # published rank-error bound (+1 discreteness)
        for p, v in zip((0.5, 0.95, 0.99), out[row["l_returnflag"]]):
            # returned value must be an actual element of the group (GK
            # sketches return observed values, not interpolations)
            assert v in vals
            lo = sum(1 for x in vals if x < v)  # min rank of v (0-based)
            hi = sum(1 for x in vals if x <= v)  # max rank of v
            target = p * n
            assert lo - tol <= target <= hi + tol, (
                f"{row['l_returnflag']} p{int(p*100)}: target rank "
                f"{target:.0f} outside [{lo - tol:.0f}, {hi + tol:.0f}] (n={n})"
            )


def test_hll_sketch_union_consistency(spark, sf_dir):
    """The HLL sketch query's estimates must sit within the configured
    relative error of exact distinct counts, and the TOTAL row — built
    by UNIONING the per-group sketches, never rescanning — must agree
    with the exact global distinct count (the mergeability property that
    makes sketches composable across partitions at scale)."""
    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.queries import QUERIES

    out = {
        r["l_returnflag"]: r["distinct_parts_est"]
        for r in QUERIES["agg_hll_sketch_union"](spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    exact["TOTAL"] = li.select("l_partkey").distinct().count()
    assert set(out) == set(exact)
    for k, est in out.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_approx_count_distinct_rsd_across_three_layouts(spark, sf_dir, duck):
    """VERDICT r9 #7: Spark's HLL++ estimate vs DUCKDB-EXACT distinct
    counts (an independent engine computes the truth) across all three
    grouping layouts — global, single-key, composite-key — each within
    5x the configured rsd. This is the permanent accuracy contract for
    the rows-only HLL queries: their sketch internals are JVM-seeded and
    engine-specific, so value-hash oracle pairing is impossible BY
    CONSTRUCTION; the bound, not the bits, is the spec."""
    li = table(spark, sf_dir, "lineitem")
    rsd = 0.01
    layouts = {
        "global": ([], "SELECT count(DISTINCT l_partkey) AS n FROM lineitem"),
        "single": (
            ["l_returnflag"],
            "SELECT l_returnflag AS k, count(DISTINCT l_partkey) AS n "
            "FROM lineitem GROUP BY 1",
        ),
        "composite": (
            ["l_returnflag", "l_linestatus"],
            "SELECT l_returnflag || '|' || l_linestatus AS k, "
            "count(DISTINCT l_partkey) AS n FROM lineitem GROUP BY 1",
        ),
    }
    for name, (keys, sql) in layouts.items():
        est_df = li.groupBy(*keys).agg(
            F.approx_count_distinct("l_partkey", rsd=rsd).alias("est")
        )
        if keys:
            est = {
                "|".join(str(r[c]) for c in keys): r["est"]
                for r in est_df.collect()
            }
            exact = {r[0]: r[1] for r in duck.sql(sql).fetchall()}
        else:
            est = {"": est_df.collect()[0]["est"]}
            exact = {"": duck.sql(sql).fetchall()[0][0]}
        assert est.keys() == exact.keys(), name
        for k, ex in exact.items():
            rel = abs(est[k] - ex) / ex
            assert rel <= 5 * rsd, f"{name}/{k}: rel err {rel:.4f} > 5*rsd"


def _planted_overlap_docs(spark):
    """Seeded corpus with a CONTROLLED Jaccard spectrum (the fixture's
    own pair distribution is bimodal ~0.1 / ~1.0, which cannot separate
    recall floors at two thresholds): 40 pairs whose shared-prefix
    fraction sweeps 0.3..0.95 plus 100 unrelated docs."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(2000)]
    rows, did = [], 0
    for i in range(40):
        frac = 0.3 + 0.65 * i / 39
        base = [rng.choice(vocab) for _ in range(80)]
        k = int(80 * frac)
        other = base[:k] + [rng.choice(vocab) for _ in range(80 - k)]
        rows.append((did, " ".join(base))); did += 1
        rows.append((did, " ".join(other))); did += 1
    for _ in range(100):
        rows.append((did, " ".join(rng.choice(vocab) for _ in range(80))))
        did += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_recall_floors_at_two_thresholds(spark):
    """VERDICT r9 #7: pinned recall floors for BOTH rows-only MinHash
    tiers at two Jaccard thresholds, against the exact shingle-Jaccard
    pair set (the same exact expansion the md5 twin's oracle replays).
    Everything is seeded/deterministic, so these are exact replays, not
    flaky statistics: measured lsh 1.0/1.0 and banded 1.0/0.941 on this
    corpus. The S-curve explains the banded 0.5-tier gap: at b=16, r=4
    a pair at exactly J=0.5 collides with p = 1-(1-0.5^4)^16 ~ 0.64,
    rising to ~0.99 by J=0.7 — the documented trade of the one-exchange
    banding design. These queries stay rows-only PERMANENTLY: xxhash64
    and pyspark.ml's JVM-seeded MinHash have no DuckDB counterpart, so
    the md5 twin carries the bit-exact oracle and this test carries the
    accuracy contract."""
    from les_etl_pipeline_spark.operators import dedup

    docs = _planted_overlap_docs(spark)
    truth = {
        (r.id_a, r.id_b): r.jaccard_raw
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.05, max_shingle_freq=None
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            docs, jaccard_threshold=0.3, seed=42
        ).collect()
    }
    banded = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_banded_pairs(
            docs, threshold=0.5, hash_family="xxhash64"
        ).collect()
    }
    floors = {0.7: (0.95, 0.95), 0.5: (0.90, 0.85)}  # (lsh, banded)
    for thr, (lsh_floor, banded_floor) in floors.items():
        hi = {p for p, j in truth.items() if j >= thr}
        assert len(hi) >= 5, f"corpus must have pairs at J >= {thr}"
        lsh_recall = len(hi & lsh) / len(hi)
        banded_recall = len(hi & banded) / len(hi)
        assert lsh_recall >= lsh_floor, (thr, lsh_recall)
        assert banded_recall >= banded_floor, (thr, banded_recall)
