"""Deterministic sampling / dataset splitting for training pipelines.

A 100 TB corpus needs train/val/test splits that are (a) reproducible
across runs and engines, (b) stable under re-partitioning and appends —
properties ``df.sample``/``rand()`` do not give (they depend on partition
layout and task scheduling). The standard fix is content-keyed hashing:
the split of a row is a pure function of its key, so any engine computes
the same assignment. md5 is used as the portable hash (same answer in
Spark, DuckDB, Python) — this is a per-row scalar, whole-stage codegen,
no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(key: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5(key) —
    portable across engines (DuckDB: ('0x' || substr(md5(k),1,7))::BIGINT
    % buckets)."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 7), 16, 10).cast("long")
        % F.lit(buckets)
    )


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    split_col: str = "split",
    buckets: int = HASH_BUCKETS,
    remainder_label: str | None = None,
) -> DataFrame:
    """Assign every row a split label by hashed key ranges.

    fractions: {"train": 0.9, "val": 0.05, "test": 0.05} — must sum to
    <= 1.0. EVERY label (including the last) is bounded by its own bucket
    cutoff, so {"train": .9, "val": .05, "test": .02} really yields 2%
    test; the unallocated remainder (and only it) gets ``remainder_label``
    (default None — a NULL split, easy to filter or audit). Rows whose
    ``key`` is NULL hash to no bucket and also get ``remainder_label``
    (documented rather than silently landing in the last split). Adding
    new rows later never reassigns existing rows."""
    total = sum(fractions.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    b = hash_bucket(key, buckets)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cond = b < F.lit(int(round(acc * buckets)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    out = expr.otherwise(F.lit(remainder_label))
    return df.withColumn(split_col, out)


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each row gets sample key u^(1/w) with u a
    deterministic uniform from md5(key), and the k largest keys win.
    Higher weight => higher inclusion probability, yet the draw is
    reproducible across runs, engines, and partitionings (rand() is
    none of these). One TakeOrderedAndProject — no full sort at scale.

    The standard quality-weighted corpus subsample: weight by a quality
    score and the sample leans high-quality without becoming a hard
    top-k cutoff.

    A-Res requires w > 0: rows with zero, negative, or null weight are
    filtered out before the draw (w=0 would divide by zero under ANSI
    mode; w<0 would silently invert the ordering)."""
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (hash_bucket(key, buckets) + 1) / F.lit(float(buckets))  # (0, 1]
    skey = F.pow(u, F.lit(1.0) / w)
    return (
        df.where(w > 0)
        .withColumn("sample_key", skey)
        .orderBy(F.col("sample_key").desc(), F.col(key))
        .limit(k)
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash bucket
    falls under its stratum's fraction. The deterministic twin of
    ``df.sampleBy`` — same output on every run/engine/partitioning.
    Strata absent from ``fractions`` are dropped (sampleBy semantics)."""
    b = hash_bucket(key, buckets)
    s = F.col(strata_col).cast("string")
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        keep = keep | ((s == F.lit(str(stratum))) & (b < F.lit(int(round(frac * buckets)))))
    return df.where(keep)


def weighted_sample_per_group(
    df: DataFrame,
    key: str,
    weight: Column | str,
    group_cols: list[str],
    k: int,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Per-group deterministic weighted reservoir: exactly k rows PER
    GROUP (fewer iff the group is smaller), drawn without replacement
    with probability increasing in weight — the fixed-quota stratified
    counterpart of ``weighted_sample_topk`` (global k) and
    ``stratified_hash_sample`` (per-stratum FRACTION, no quota). Same
    Efraimidis-Spirakis keys (u^(1/w), u a deterministic md5 uniform),
    ranked per group through ``scale.two_phase_topk_per_group`` — the
    per-partition reservoir fold means no task ever sorts a whole
    stratum, the usual failure mode of quota sampling over a corpus
    where one source dominates. Adds ``sample_key`` and ``rn``."""
    from .scale import two_phase_topk_per_group

    w = F.col(weight) if isinstance(weight, str) else weight
    u = (hash_bucket(key, buckets) + 1) / F.lit(float(buckets))  # (0, 1]
    base = df.where(w > 0).withColumn("sample_key", F.pow(u, F.lit(1.0) / w))
    return two_phase_topk_per_group(
        base, group_cols, [("sample_key", False), (key, True)], k
    )
