"""Scale operators: skew mitigation and shuffle elimination.

These are the 100 TB levers (BASELINE.json north star) packaged as
reusable transforms:

- salted_agg: two-phase aggregation over a salted key — a hot key's rows
  spread across `salt_buckets` reducers in phase 1, then a tiny phase-2
  combine. Identical results to a plain groupBy (the oracle checks this);
  AQE's skew handling covers joins, but a single monster GROUP BY key
  still needs salting.
- salted_join: replicate the small side `salt_buckets` times so a skewed
  big-side key spreads over many tasks. (With AQE skew-join on, prefer
  the built-in; this is the explicit form for when the optimizer can't
  see the skew, e.g. post-UDF.)
- bucketed writes: co-locate both join sides on the join key at write
  time so later joins run with NO exchange (verified by plan assertion in
  tests/test_scale.py).

Aggregations passed to salted_agg must be decomposable (sum/count/min/
max); avg is derived as sum/count by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a uniformly-distributed row
    attribute hash (not rand(): deterministic => retries and the oracle
    comparison stay stable)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: {out_name: (fn, col)} with fn in {sum, count, min, max}.
    Phase 1 groups on (group_cols + salt) — the hot key fans out over
    `buckets` reducers; phase 2 combines the per-salt partials (sum of
    counts, min of mins, ...). Result == plain groupBy().agg()."""
    phase1_aggs = []
    phase2_aggs = []
    for out, (fn, col) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(p))
            phase2_aggs.append(F.sum(p).alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(p))
            phase2_aggs.append(F.sum(p).alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(p))
            phase2_aggs.append(F.min(p).alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(p))
            phase2_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*group_cols, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*group_cols).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salt values, join on (key, salt). Row-for-row identical to
    big.join(small, on, how) for inner/left joins only — a right/full
    outer join would emit each unmatched small-side row once per salt
    replica, so those modes are rejected."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: the "
            "replicated small side duplicates unmatched rows under outer modes"
        )
    big_s = with_salt(big, buckets)
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("_salt")
    small_r = small.select("*", salts)
    return big_s.join(small_r, [on, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: later equi-joins/aggs on bucket_col read
    co-located buckets and skip the exchange entirely."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — plan contains no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def global_row_ids(
    df: DataFrame,
    key: str | list,
    id_name: str = "row_id",
    num_partitions: int | None = None,
    _keep_total: bool = False,
) -> DataFrame:
    """Assign global consecutive 1-based ids in ``key`` order WITHOUT a
    global-order window (which would sort every row in one task — the
    same scale-killer the sweep-line and sequence-packing operators
    shard away).

    ``key`` is a column name or a list of names / sort-order Columns
    (e.g. ``[F.col("f").desc(), "tok"]``); the composite must be a
    total order (unique across rows).

    Three-phase plan: range-partition on the key (contiguous key ranges
    per partition), rank within each partition in parallel
    (partitionBy(spark_partition_id) — every window task independent),
    then add each partition's carried offset (cumulated per-partition
    counts — a window over ONE ROW PER PARTITION, metadata scale). The
    assigned id equals rank-in-total-order, so the output is invariant
    to where the sampled range boundaries happen to fall. The classic
    zipWithIndex, expressed in DataFrame operations.

    ``_keep_total`` additionally attaches the total row count as column
    ``_total`` (computed on the metadata-scale per-partition counts —
    no extra pass over the data); exact_ntile builds on it.

    The _pid-labeled rows are CHECKPOINTED before fan-out: range
    boundaries come from reservoir SAMPLING, re-sampled per execution,
    so the offsets branch and the join branch would otherwise each roll
    their own boundaries and the carried offsets could disagree with the
    row labels (caught r6 by carried_cumsum's oracle on a 9911-row
    value table; small inputs sample exhaustively, which is why the
    500-row test always agreed). On a cluster, swap localCheckpoint for
    a persisted staging table — the materialization is the point."""
    from pyspark.sql.window import Window as W

    keys = key if isinstance(key, list) else [key]
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # eager=False: the checkpoint still pins ONE RDD instance (one set
    # of sampled range boundaries shared by both consumers — the
    # correctness point), but materialization waits for the first real
    # action instead of running at query-construction time (plan
    # inspection / registry sweeps would otherwise execute data-scale
    # jobs for every consuming query).
    parts = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local_w = W.partitionBy("_pid").orderBy(*cols)
    local = parts.withColumn("_local", F.row_number().over(local_w))
    # one row per partition; the only ordered-unpartitioned window
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "_total",
            F.sum("_n").over(
                W.orderBy("_pid").rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            ),
        )
        .drop("_n")
    )
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_name, (F.col("_local") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )
    return out if _keep_total else out.drop("_total")


def exact_ntile(
    df: DataFrame,
    key: str | list,
    k: int,
    bucket_name: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT SQL ``ntile(k)`` over the total order given by ``key``,
    with no unpartitioned data-scale window (the plain
    ``ntile(k).over(W.orderBy(...))`` sorts the whole input in ONE task
    — the scale-killer this replaces). Bit-identical to the window
    function: with n rows, the first ``n % k`` buckets hold
    ``n div k + 1`` rows, the rest ``n div k`` — derived arithmetically
    from the parallel global rank of ``global_row_ids``.

    Output = input columns + ``bucket_name`` (int, 1-based)."""
    ranked = global_row_ids(
        df, key, id_name="_rid", num_partitions=num_partitions, _keep_total=True
    )
    rid, n = F.col("_rid"), F.col("_total")
    base = F.floor(n / k).cast("long")  # rows in a small bucket
    rem = (n % k).cast("long")  # number of buckets holding base+1 rows
    thr = rem * (base + 1)  # last rid belonging to a big bucket
    # greatest(base, 1): when n < k every row falls in the first branch,
    # but ANSI mode must never see a division by zero in the dead branch
    bucket = (
        F.when(rid <= thr, F.floor((rid - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rid - thr - 1) / F.greatest(base, F.lit(1))) + 1)
        .cast("int")
    )
    return ranked.withColumn(bucket_name, bucket).drop("_rid", "_total")


def carried_cumsum(
    df: DataFrame,
    key: str | list,
    value_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive prefix sums of ``value_cols`` in ``key`` order
    WITHOUT a global-order window — the running-total counterpart of
    global_row_ids, and the building block for distributed order
    statistics (exact median, Mann-Whitney ranks, KS CDFs).

    Same three-phase shape: range-partition on the key, per-partition
    running sums in parallel (partitionBy(spark_partition_id)), then add
    each partition's carried totals (cumulated on the ONE-row-per-
    partition offset table, metadata scale). ``key`` must be a total
    order (unique composite). Adds one ``cum_<col>`` column per value
    column. The labeled rows are checkpointed for the same reason as
    global_row_ids: per-execution boundary sampling must not let the two
    consumers disagree on _pid."""
    from pyspark.sql.window import Window as W

    keys = key if isinstance(key, list) else [key]
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # one RDD instance; see global_row_ids
    )
    run_w = W.partitionBy("_pid").orderBy(*cols).rowsBetween(W.unboundedPreceding, 0)
    local = parts
    for v in value_cols:
        local = local.withColumn(f"_lc_{v}", F.sum(v).over(run_w))
    off_w = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = local.groupBy("_pid").agg(
        *[F.sum(v).alias(f"_t_{v}") for v in value_cols]
    )
    for v in value_cols:
        offsets = offsets.withColumn(
            f"_o_{v}", F.coalesce(F.sum(f"_t_{v}").over(off_w), F.lit(0))
        ).drop(f"_t_{v}")
    out = local.join(F.broadcast(offsets), "_pid")
    for v in value_cols:
        out = out.withColumn(f"cum_{v}", F.col(f"_lc_{v}") + F.col(f"_o_{v}")).drop(
            f"_lc_{v}", f"_o_{v}"
        )
    return out.drop("_pid")


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT linearly-interpolated quantiles (quantile_cont / numpy
    type-7: h = p*(n-1), v = v_lo + frac*(v_hi - v_lo)) of a column with
    NO global sort and NO driver-side value buffer — the generalization
    of the median query over the same carried-prefix-sum CDF. One pass
    builds the value-grain CDF; each requested probability turns into
    two conditional-min order-statistic selections in a single
    aggregate; the per-probability rows are exploded from that one
    result row. Returns (prob double, value double) rows.

    The selection thresholds depend only on (n, p): h is the same double
    expression in any engine, so results are bit-stable.

    Null contract (matches quantile_cont / percentile_cont / median):
    NULL values of ``col`` are excluded from the CDF and from ``n``."""
    vg = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cdf = carried_cumsum(vg, "p", ["c"], num_partitions=num_partitions)
    # n = the CDF's final value — no second scan of the base table
    tot = cdf.agg(F.max("cum_c").alias("n"))
    aggs = [F.max("n").alias("n")]
    for j, q in enumerate(probs):
        h = F.lit(float(q)) * (F.col("n") - 1)  # 0-based fractional index
        k_lo = (F.floor(h) + 1).cast("long")  # 1-based order statistics
        k_hi = (F.floor(h) + 2).cast("long")
        aggs.append(F.min(F.when(F.col("cum_c") >= k_lo, F.col("p"))).alias(f"_lo{j}"))
        aggs.append(
            F.min(
                F.when(F.col("cum_c") >= F.least(k_hi, F.col("n")), F.col("p"))
            ).alias(f"_hi{j}")
        )
    one = cdf.crossJoin(F.broadcast(tot)).agg(*aggs)
    rows = []
    for j, q in enumerate(probs):
        h = F.lit(float(q)) * (F.col("n") - 1)
        frac = h - F.floor(h)
        v = F.col(f"_lo{j}") + frac * (F.col(f"_hi{j}") - F.col(f"_lo{j}"))
        rows.append(F.struct(F.lit(float(q)).alias("prob"), v.alias("value")))
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.prob", "r.value")


def two_phase_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_spec: list[tuple[str, bool]],
    k: int,
) -> DataFrame:
    """Top-k rows per group WITHOUT a per-group window over the raw
    stream — the hot-group-straggler-free twin of
    ``row_number().over(partitionBy(group))`` (the same fix the KMV
    bottom-k got in VERDICT r10: a per-group window puts EVERY row of a
    group into one task, so 3 grouping values over 100 TB means 3 tasks
    sorting ~33 TB each).

    ``order_spec``: [(col, ascending)] — must be a TOTAL order (carry a
    unique tiebreaker) so top-k is a deterministic set and the two-phase
    result equals the window form bit-for-bit.

    Rows with a NULL — or, for float/double order columns, a NaN — in
    ANY order column are EXCLUDED (enforced here, not assumed): Spark
    ranks nulls first under ASC while the pandas fold's na_position puts
    them last, and NaN has the mirror-image problem (Spark sorts NaN
    LARGEST — first under DESC — while pandas treats it as NA and drops
    it to the end of the fold, so a NaN row surviving an under-full
    partition would outrank real rows in phase 2). Excluding both makes
    the contract explicit, engine-independent, and partition-layout-
    independent (VERDICT r11 ADVICE); coalesce/nanvl upstream to rank
    them deliberately.

    Phase 1 (mapInPandas on raw scan partitions, NO upstream shuffle):
    fold Arrow batches keeping each group's k best rows seen so far —
    each partition emits <= k rows per group present, an absolute bound
    independent of group size. Phase 2 (exact): per-group window over
    the bounded partials only (<= k x partitions-touching-the-group rows
    per group, metadata-scale). Exact by the merge identity: a row in
    the true global top-k is in its own partition's top-k (fewer
    competitors), so the union of partials contains the answer and the
    final rank recovers it. Returns the input columns plus ``rn``."""
    from collections.abc import Iterator

    gcols = list(group_cols)
    by = [c for c, _ in order_spec]
    asc = [a for _, a in order_spec]
    for c in by:
        pred = F.col(c).isNotNull()
        if isinstance(df.schema[c].dataType, (T.FloatType, T.DoubleType)):
            pred = pred & ~F.isnan(F.col(c))
        df = df.where(pred)
    cols = df.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        acc = None
        for pdf in batches:
            part = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = (
                part.sort_values(by, ascending=asc, kind="mergesort")
                .groupby(gcols, sort=False, dropna=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc[cols]

    from pyspark.sql.window import Window

    partials = df.mapInPandas(op, schema=out_schema)
    w = Window.partitionBy(*gcols).orderBy(
        *[F.col(c).asc() if a else F.col(c).desc() for c, a in order_spec]
    )
    return (
        partials.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.lit(k))
    )


def exact_weighted_quantiles(
    df: DataFrame,
    col: str,
    weight: str,
    probs: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT weighted lower quantiles — min{v : cumweight(v) >= p * W} —
    with NO global sort and NO single-task window, over the same
    carried-prefix-sum CDF as ``exact_quantiles`` but accumulating the
    WEIGHT column instead of row counts (duration-weighted latency
    percentiles, token-weighted doc-length cuts — the shapes where every
    row does not count equally).

    Weights are accumulated AS GIVEN: pass an integer-typed weight for
    bit-stable cross-engine thresholds (integer sums are exact and
    order-independent; double weights would make cum >= p*W flip at the
    margin under different partition orders). Null values and null
    weights are excluded. Returns (prob double, value double)."""
    vg = (
        df.where(F.col(col).isNotNull() & F.col(weight).isNotNull())
        .groupBy(F.col(col).alias("p"))
        .agg(F.sum(weight).alias("w"))
    )
    cdf = carried_cumsum(vg, "p", ["w"], num_partitions=num_partitions)
    tot = cdf.agg(F.max("cum_w").alias("tw"))
    aggs = []
    for j, q in enumerate(probs):
        thr = F.lit(float(q)) * F.col("tw").cast("double")
        aggs.append(
            F.min(F.when(F.col("cum_w").cast("double") >= thr, F.col("p"))).alias(
                f"_q{j}"
            )
        )
    one = cdf.crossJoin(F.broadcast(tot)).agg(*aggs)
    rows = [
        F.struct(F.lit(float(q)).alias("prob"), F.col(f"_q{j}").alias("value"))
        for j, q in enumerate(probs)
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.prob", "r.value")


def exact_weighted_quantiles_grouped(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    weight: str,
    probs: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT weighted lower quantiles PER GROUP — min{v : cumweight_g(v)
    >= p * W_g} — with no per-group ordered window over the value grain
    (the hot-group straggler: one group's whole distinct-value set in a
    single sort task) and no global sort either.

    Shape: ONE range partition in (group, value) order (groups larger
    than a partition span several tasks), then the per-group cumulative
    is computed DIRECTLY with group-aware carried sums: the local
    running sum resets at group boundaries (window keyed on
    (partition, group)), and each (partition, group) slice adds the
    carried total of the SAME group's earlier partitions — a
    metadata-scale offsets table, one row per group-slice. This is the
    r13 global-CDF-minus-offset form with the subtraction done in the
    partitioner (r14, guide §2.3): the global row-rank cumsum, the
    tie-free min_by offset aggregate and its join all drop out, and the
    cumulative never mixes other groups' weights. Thresholds join back
    null-safely (a NULL group is a group) and each (group, prob) answer
    is a conditional-min AGGREGATE, not a window over raw rows.
    Integer-typed weights keep every threshold comparison bit-stable
    across engines. Returns (group..., prob double, value double)."""
    from pyspark.sql.window import Window as W

    from ..operators.sketches import _join_null_safe

    gcols = list(group_cols)
    vg = (
        df.where(F.col(col).isNotNull() & F.col(weight).isNotNull())
        .groupBy(*gcols, F.col(col).alias("_v"))
        .agg(F.sum(weight).alias("w"))
    )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    order_cols = [F.col(c) for c in gcols] + [F.col("_v")]
    # same checkpoint rationale as carried_cumsum: both consumers below
    # must see ONE _pid assignment per row
    parts = (
        vg.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    run_w = (
        W.partitionBy("_pid", *gcols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = parts.withColumn("_lc", F.sum("w").over(run_w))
    off_w = W.partitionBy(*gcols).orderBy("_pid").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = (
        parts.groupBy("_pid", *gcols)
        .agg(F.sum("w").alias("_t"))
        .withColumn("_o", F.coalesce(F.sum("_t").over(off_w), F.lit(0)))
        .withColumn("_wg", F.sum("_t").over(W.partitionBy(*gcols)))
        .drop("_t")
    )
    # offsets is metadata-scale BY CONSTRUCTION: parts is range-
    # partitioned in (group, value) order, so each group's rows span a
    # CONTIGUOUS run of partitions and the (pid, group) slice count is
    # <= n_partitions + n_groups - 1. Broadcast it explicitly — the
    # checkpointed lineage has no size stats, so the planner would
    # otherwise sort-merge this join and pay an exchange + sort of the
    # full VALUE-GRAIN left side (r15, guide §3.1: measured 4
    # SortMergeJoin -> 0 on agg_mad_outliers_by_flag).
    scored = _join_null_safe(local, F.broadcast(offsets), ["_pid"] + gcols).select(
        *gcols,
        "_v",
        (F.col("_lc") + F.col("_o")).cast("double").alias("_cumg"),
        F.col("_wg").cast("double").alias("_wg"),
    )
    exploded = scored.select(
        *gcols,
        "_v",
        "_cumg",
        "_wg",
        F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("prob"),
    )
    return (
        exploded.where(F.col("_cumg") >= F.col("prob") * F.col("_wg"))
        .groupBy(*gcols, "prob")
        .agg(F.min("_v").alias("value"))
    )


def grouped_mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    k: float = 3.0,
    scale_const: float = 1.4826,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group robust outlier statistics: lower median, MAD (median
    absolute deviation), and the count of rows beyond k x 1.4826 x MAD —
    the robust z-score filter that survives the heavy tails where
    mean/stddev outlier rules break (1.4826 makes MAD consistent with
    sigma under normality).

    Scale shape: the raw stream is aggregated ONCE to (group, value,
    count) grain and lazily localCheckpointed; BOTH median passes (the
    value median, then the median of absolute deviations) run as
    carried-CDF weighted lower quantiles (min{v : cumweight >= 0.5 W})
    over that bounded table — no per-group ordered window over raw rows,
    no second raw scan (weight=count on the value grain IS the
    unweighted quantile on raw). Every comparison is integer-count vs
    p*W double — bit-stable across engines; med/mad are SELECTED order
    statistics (no float summation anywhere), so the output replays
    exactly in SQL. NULL values excluded; a NULL group is a group.
    Returns (group..., med double, mad double, n, n_outliers)."""
    from ..operators.sketches import _join_null_safe

    gcols = list(group_cols)
    vg = (
        df.where(F.col(col).isNotNull())
        .groupBy(*gcols, F.col(col).cast("double").alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    med = exact_weighted_quantiles_grouped(
        vg, gcols, "_v", "_c", [0.5], num_partitions=num_partitions
    ).select(*gcols, F.col("value").alias("med"))
    # dev feeds two consumers (the MAD CDF pass and the final outlier
    # aggregate) — checkpoint the bounded value-grain frame once so the
    # median pass is not re-derived per consumer. med/mad are ONE row
    # per group: broadcast them explicitly (the checkpointed lineage has
    # no size stats, so the planner would sort-merge and exchange the
    # value-grain side — r15, guide §3.1).
    dev = (
        _join_null_safe(vg, F.broadcast(med), gcols)
        .select(*gcols, F.abs(F.col("_v") - F.col("med")).alias("_d"), "_c", "med")
        .localCheckpoint(eager=False)
    )
    mad = exact_weighted_quantiles_grouped(
        dev, gcols, "_d", "_c", [0.5], num_partitions=num_partitions
    ).select(*gcols, F.col("value").alias("mad"))
    thr = float(k) * float(scale_const)
    return (
        _join_null_safe(dev, F.broadcast(mad), gcols)
        .groupBy(*gcols, "med", "mad")
        .agg(
            F.sum("_c").cast("long").alias("n"),
            F.sum(
                F.when(F.col("_d") > F.lit(thr) * F.col("mad"), F.col("_c")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
