"""Skyline (Pareto-frontier) operator: the rows of a relation not
strictly dominated on a (minimize, maximize) criterion pair — the
classic multi-criteria OLAP operator (Borzsony/Kossmann/Stocker, ICDE
2001) the relational surface otherwise lacks. "Best tradeoff" queries
(cheapest part per size tier, highest-quality doc per length budget)
are skylines.

Semantics (2-D, nulls in either criterion excluded up front): row r is
in the skyline iff NO row s in the same group has
``s.mn <= r.mn AND s.mx >= r.mx AND (s.mn < r.mn OR s.mx > r.mx)``.
Ties are KEPT: two rows with identical (mn, mx) dominate no one and
both survive — so the operator is a filter, never a sampler, and the
DuckDB ``NOT EXISTS`` oracle replays it bit-exactly.

Scale shape (the reason this is not a self-join): a naive formulation
is an all-pairs theta join — quadratic, forbidden by the plan gate. The
implementation is the two-phase local-prune idiom this repo already
uses for MG heavy hitters and KMV bottom-k:

- Phase 1 (mapInPandas on raw scan partitions, NO upstream shuffle):
  each partition emits its LOCAL skyline. Dominance within a partition
  implies global dominance, so local pruning never drops a global
  skyline row; for non-adversarial layouts a partition's skyline is
  O(log n) expected rows (random 2-D points), and never more than its
  distinct-mn count.
- Phase 2 (exact, relational, over the bounded partials): group the
  survivors per (group, mn) to their max mx, prev-max cumulate over mn
  ascending (one row per distinct mn — metadata-scale), keep mn cells
  whose max beats every strictly-cheaper cell, then semi-join the
  partials back. Only strictly-dominated rows are ever dropped, and by
  transitivity of strict dominance every globally-dominated row still
  has a surviving dominator among the partials — so phase 2 returns the
  EXACT global skyline, ties included.

The only window is over the per-(group, mn) cell table: partitioned by
the group when one is given; for the ungrouped form it is an
unpartitioned window over the locally-pruned candidate cells — bounded,
and allowlisted by name in the plan gate with that justification.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _drop_null_nan_criteria(df: DataFrame, crit: list[str]) -> DataFrame:
    """Exclude rows with a NULL criterion — and, for float/double
    criteria, NaN too (NaN passes isNotNull but every numpy comparison
    against it is False, so a NaN-keyed row would survive every
    dominance check; SQL replays sort NaN largest instead — the same
    gap two_phase_topk_per_group closes, applied here consistently)."""
    dtypes = dict(df.dtypes)
    out = df
    for c in crit:
        cond = F.col(c).isNotNull()
        if dtypes.get(c) in ("float", "double"):
            cond = cond & ~F.isnan(F.col(c))
        out = out.where(cond)
    return out


def _local_skyline_pdf(pdf, gcols: list[str], mn: str, mx: str):
    """Exact skyline of one pandas frame (vectorized; ties kept)."""
    import numpy as np

    key = gcols + [mn]
    cellmax = pdf.groupby(key, sort=False, dropna=False)[mx].transform("max")
    cand = pdf[pdf[mx] == cellmax]
    cells = (
        cand[key + [mx]]
        .drop_duplicates(key)
        .sort_values(key, kind="mergesort")
        .reset_index(drop=True)
    )
    cm = (
        cells.groupby(gcols, sort=False, dropna=False)[mx].cummax()
        if gcols
        else cells[mx].cummax()
    )
    prev = cm.shift(1)
    if gcols:
        first = (cells[gcols] != cells[gcols].shift(1)).any(axis=1)
        prev[first] = np.nan
    keep_cells = cells[prev.isna() | (cells[mx] > prev)]
    return cand.merge(keep_cells[key], on=key, how="inner")


def _skyline_flat_nd(pdf, mins: list[str], maxs: list[str]):
    """Exact d-dimensional skyline of one pandas frame (ties kept).

    All criteria are normalized to MINIMIZE (maximize columns negated),
    rows are scanned in lexicographic order — a dominator always sorts
    strictly before anything it dominates, so each row only needs a
    vectorized (<=, <) check against the skyline built so far: O(n·m·d)
    with m the running skyline size (expected polylog for independent
    dimensions). Comparisons stay on each column's own numpy dtype —
    no stacking into a common matrix, so int64 criteria never round
    through float64."""
    import numpy as np

    n = len(pdf)
    if n == 0:
        return pdf
    arrs = [pdf[c].to_numpy() for c in mins] + [
        np.negative(pdf[c].to_numpy()) for c in maxs
    ]
    order = np.lexsort(tuple(reversed(arrs)))  # arrs[0] is the primary key
    sky = [np.empty(n, dtype=a.dtype) for a in arrs]
    keep: list[int] = []
    m = 0
    for idx in order:
        if m:
            le = np.ones(m, dtype=bool)
            lt = np.zeros(m, dtype=bool)
            for j, a in enumerate(arrs):
                s = sky[j][:m]
                v = a[idx]
                le &= s <= v
                lt |= s < v
            if (le & lt).any():
                continue
        for j, a in enumerate(arrs):
            sky[j][m] = a[idx]
        m += 1
        keep.append(idx)
    return pdf.iloc[np.sort(np.asarray(keep, dtype=np.int64))]


def _skyline_nd_pdf(pdf, gcols: list[str], mins: list[str], maxs: list[str]):
    """Per-group exact d-dim skyline of one pandas frame (NULL group
    keys are groups, matching Spark GROUP BY)."""
    import pandas as pd

    if not gcols:
        return _skyline_flat_nd(pdf, mins, maxs)
    outs = [
        _skyline_flat_nd(sub, mins, maxs)
        for _, sub in pdf.groupby(gcols, dropna=False, sort=False)
    ]
    return pd.concat(outs, ignore_index=True) if outs else pdf.iloc[0:0]


def skyline(
    df: DataFrame,
    minimize: list[str],
    maximize: list[str],
    group_cols: list[str] | None = None,
    max_candidates: int | None = 4_000_000,
) -> DataFrame:
    """Two-phase exact d-dimensional skyline (d = len(minimize) +
    len(maximize) >= 1): rows of ``df`` (per group, if ``group_cols``)
    not strictly dominated — no other row in the group is <= on every
    minimize column, >= on every maximize column, and strict somewhere.
    Ties kept; rows with a NULL — or, for float/double criteria, a NaN —
    in ANY criterion are excluded (same contract as ``skyline_2d``; NaN
    passes isNotNull but compares False against everything in numpy, so
    an un-excluded NaN row would never be dominated and would pollute
    the skyline, diverging from the SQL replay where NaN sorts largest).
    A NULL group key is a group.

    Scale shape (generalizes the 2-D two-phase local-prune form — the
    2-D prev-max cumulation has no d>2 analogue, so phase 2 changes):

    - Phase 1 (mapInPandas on raw scan partitions, NO upstream shuffle):
      each partition emits its LOCAL skyline per group. Local dominance
      implies global dominance, so the prune never drops a global
      skyline row; emitted rows are bounded by the partition's local
      skyline size (expected polylog per group for independent
      dimensions).
    - Phase 2 (exact, over the bounded partials only): gather each
      group's candidates into ONE applyInPandas task and run the same
      exact in-memory skyline. Correct because strict dominance is
      transitive and irreflexive (a strict partial order): every
      globally-dominated row has a dominator INSIDE the global skyline,
      which phase 1 preserved — so checking candidates against
      candidates alone decides global membership exactly. The ungrouped
      form is a single bounded task over the candidate set — the exact
      analogue of the allowlisted unpartitioned windows over two-phase
      partials (never raw rows), and never a quadratic join in the
      plan: the candidate x candidate check lives inside the Arrow
      batch, so no BNLJ/CartesianProduct appears.

    Fail-loud candidate bound (same invariant class as the exact-HH
    completeness guards, sketches.heavy_hitters_exact): the "bounded
    partials" argument assumes roughly independent criteria — under
    ANTI-correlated criteria the true skyline (hence phase 2's single
    per-group task) is Θ(N). ``max_candidates`` caps the per-group
    phase-1 survivor count IN-PLAN: the count is computed over the
    checkpointed partials and an ``assert_true`` column is joined onto
    the phase-2 input, so a violating input raises a clear error while
    rows stream toward the gather — before the Arrow frame
    materializes — instead of OOMing one executor. ``None`` disables
    the guard (oracle replays of adversarial fixtures)."""
    gcols = list(group_cols or [])
    mins, maxs = list(minimize), list(maximize)
    if not mins and not maxs:
        raise ValueError("skyline needs at least one criterion")
    base = _drop_null_nan_criteria(df, mins + maxs)
    cols = base.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in base.schema.fields
    )

    def fold(batches: Iterator) -> Iterator:
        import pandas as pd

        acc = None
        for pdf in batches:
            part = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = _skyline_nd_pdf(part, gcols, mins, maxs)
        if acc is not None and len(acc):
            yield acc[cols]

    partials = base.mapInPandas(fold, schema=out_schema)
    if not gcols:
        partials = partials.withColumn("_g", F.lit(1))
    key = gcols or ["_g"]

    if max_candidates is not None:
        # lazy checkpoint: the partials feed the guard count AND the
        # gather — uncheckpointed, each branch re-runs the raw scan.
        partials = partials.localCheckpoint(eager=False)
        counts = partials.groupBy(*key).agg(F.count(F.lit(1)).alias("_n"))
        guard = counts.select(
            *key,
            F.assert_true(
                F.col("_n") <= F.lit(max_candidates),
                F.concat(
                    F.lit("skyline phase-2 candidate bound violated: "),
                    F.col("_n").cast("string"),
                    F.lit(
                        f" local-skyline survivors > max_candidates="
                        f"{max_candidates} in one group — the criteria are"
                        " anti-correlated enough that the true skyline is"
                        " near-linear; raise max_candidates, drop a"
                        " dimension, or pre-bucket the group"
                    ),
                ),
            ).alias("_sky_ok"),
        )
        # guard is one row per group (metadata-scale) — broadcast so the
        # check adds no shuffle; eqNullSafe because a NULL group key is
        # a group. Selecting _sky_ok into the phase-2 input forces the
        # assert to evaluate on the shuffle-write side of the gather.
        p, g = partials.alias("p"), F.broadcast(guard).alias("g")
        cond = F.lit(True)
        for c in key:
            cond = cond & F.col(f"p.{c}").eqNullSafe(F.col(f"g.{c}"))
        partials = p.join(g, cond, "inner").select(
            *[F.col(f"p.{c}") for c in cols + ([] if gcols else ["_g"])],
            F.col("g._sky_ok"),
        )

    def exact(pdf):
        return _skyline_nd_pdf(pdf[cols], gcols, mins, maxs)[cols]

    return partials.groupBy(*key).applyInPandas(exact, schema=out_schema)


def skyline_2d(
    df: DataFrame, minimize: str, maximize: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Two-phase exact 2-D skyline: rows of ``df`` (per group, if
    ``group_cols``) not strictly dominated on (minimize ``minimize``,
    maximize ``maximize``). Null criteria are excluded (SQL comparison
    with NULL is never true, so the NOT EXISTS form would pass null rows
    vacuously — the operator pins the useful semantics instead); NaN
    float/double criteria are excluded for the same reason (pandas
    cummax SKIPS NaN while the SQL replay sorts it largest — see
    ``_drop_null_nan_criteria``)."""
    gcols = list(group_cols or [])
    mn, mx = minimize, maximize
    base = _drop_null_nan_criteria(df, [mn, mx])
    cols = base.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in base.schema.fields
    )

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        acc = None
        for pdf in batches:
            part = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = _local_skyline_pdf(part, gcols, mn, mx)
        if acc is not None and len(acc):
            yield acc[cols]

    # the partials feed TWO consumers (the cell aggregate and the final
    # verify join) — uncheckpointed, each would re-run the full scan +
    # fold. The lazy localCheckpoint pins one bounded partial set shared
    # by both branches (eager=False: plan inspection stays free; on a
    # cluster this becomes a persisted staging table — the repo-wide
    # idiom, see scale.global_row_ids).
    partials = base.mapInPandas(op, schema=out_schema).localCheckpoint(eager=False)

    cells = partials.groupBy(*gcols, mn).agg(F.max(mx).alias("_mx"))
    w = (
        W.partitionBy(*gcols).orderBy(mn)
        if gcols
        else W.orderBy(mn)
    ).rowsBetween(W.unboundedPreceding, -1)
    keep = (
        cells.withColumn("_prev", F.max("_mx").over(w))
        .where(F.col("_prev").isNull() | (F.col("_mx") > F.col("_prev")))
        .select(*gcols, mn, "_mx")
    )
    # NULL-SAFE group equality: a NULL group key is a group like any
    # other (GROUP BY semantics) — a plain on-list join would silently
    # drop its rows here even though the aggregate above kept them.
    # mn is non-null by the base filter, so plain equality is fine there.
    p, k = partials.alias("p"), keep.alias("k")
    cond = F.col(f"p.{mn}") == F.col(f"k.{mn}")
    for c in gcols:
        cond = cond & F.col(f"p.{c}").eqNullSafe(F.col(f"k.{c}"))
    return (
        p.join(k, cond)
        .where(F.col(f"p.{mx}") == F.col("k._mx"))
        .select(*[F.col(f"p.{c}") for c in cols])
    )
