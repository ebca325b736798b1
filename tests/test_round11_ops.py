"""Round-11 operators: the two-phase skyline (Pareto frontier) and the
two-phase hot-group top-k. Both are local-prune rewrites whose oracles
are the naive forms — these tests pin the parity on shapes the
registered queries don't cover (ties, duplicates, nulls, adversarial
partition layouts, hot groups) and the plan shapes that make them scale
(mapInPandas partials, exactly one bounded window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import scale
from les_etl_pipeline_spark.operators.skyline import skyline_2d


def _naive_skyline(rows, mn_i, mx_i, grp_i=None):
    """Quadratic reference: r survives iff no s strictly dominates it."""
    out = []
    for r in rows:
        if r[mn_i] is None or r[mx_i] is None:
            continue
        dominated = False
        for s in rows:
            if s[mn_i] is None or s[mx_i] is None:
                continue
            if grp_i is not None and s[grp_i] != r[grp_i]:
                continue
            if (
                s[mn_i] <= r[mn_i]
                and s[mx_i] >= r[mx_i]
                and (s[mn_i] < r[mn_i] or s[mx_i] > r[mx_i])
            ):
                dominated = True
                break
        if not dominated:
            out.append(r)
    return sorted(out)


# deterministic pseudo-random 2-D points with deliberate collisions:
# duplicate (mn, mx) pairs (both must survive or both fall), equal-mn
# ties (only the max-mx row survives), and a null in each criterion
def _points():
    rows = []
    for i in range(400):
        mn = float((i * 7919) % 97)  # many equal-mn collisions
        mx = ((i * 104729) % 89) - 0.0
        rows.append((i, f"g{i % 3}", mn, mx))
    rows += [(1000, "g0", 3.0, 88.0), (1001, "g0", 3.0, 88.0)]  # dup pair
    rows += [(1002, "g1", None, 5.0), (1003, "g2", 7.0, None)]  # nulls
    return rows


def test_skyline_matches_naive_with_ties_and_nulls(spark):
    rows = _points()
    df = spark.createDataFrame(
        rows, "id long, g string, mn double, mx double"
    ).repartition(7)
    got = sorted(tuple(r) for r in skyline_2d(df, "mn", "mx").collect())
    want = _naive_skyline(rows, 2, 3)
    assert got == [tuple(r) for r in want]
    # the duplicate pair survives or falls TOGETHER (skyline is a
    # filter, not a sampler)
    ids = {r[0] for r in got}
    assert (1000 in ids) == (1001 in ids)


def test_skyline_grouped_matches_naive(spark):
    rows = _points()
    df = spark.createDataFrame(
        rows, "id long, g string, mn double, mx double"
    ).repartition(5)
    got = sorted(
        tuple(r) for r in skyline_2d(df, "mn", "mx", group_cols=["g"]).collect()
    )
    want = _naive_skyline(rows, 2, 3, grp_i=1)
    assert got == [tuple(r) for r in want]


def test_skyline_adversarial_partition_layout(spark):
    """Sorted-descending input: every partition's local skyline is large
    (worst case for phase-1 pruning) — the result must still be exact."""
    rows = [(i, float(1000 - i), float(1000 - i)) for i in range(300)]
    # mn and mx move together: NOTHING dominates anything except exact
    # re-checks — the full anti-chain IS the skyline
    df = spark.createDataFrame(rows, "id long, mn double, mx double").repartition(4)
    assert skyline_2d(df, "mn", "mx").count() == 300
    # and the fully-dominated chain collapses to one row
    rows2 = [(i, float(i), float(1000 - i)) for i in range(300)]
    df2 = spark.createDataFrame(rows2, "id long, mn double, mx double").repartition(4)
    got = skyline_2d(df2, "mn", "mx").collect()
    assert len(got) == 1 and got[0].id == 0


def test_skyline_plan_is_two_phase_not_all_pairs(spark, sf_dir):
    """The scale claim, pinned: partition-local pruning via mapInPandas
    feeds the cell window — and no nested-loop join anywhere (the naive
    NOT EXISTS form would plan one). The partials are lazily
    localCheckpoint'ed (both phase-2 consumers share ONE fold instead of
    re-running the scan), so the executed plan shows the checkpoint
    boundary (Scan ExistingRDD) where the fold ran; the fold itself is
    asserted on the pre-checkpoint branch."""
    out = skyline_2d(table(spark, sf_dir, "part"), "p_retailprice", "p_size")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan  # the pinned bounded partials
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the partial fold really is mapInPandas on raw scan partitions
    from les_etl_pipeline_spark.operators import skyline as _sky

    base = table(spark, sf_dir, "part")
    pre = (
        base.where(
            F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
        )
        .mapInPandas(
            lambda it: it,
            schema=", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in base.schema.fields
            ),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in pre and "Exchange" not in pre  # no upstream shuffle


def test_two_phase_topk_equals_window_form(spark, sf_dir):
    """Bit-parity with the single-window form on real data, including
    the rn column."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    spec = [("l_extendedprice", False), ("l_orderkey", True), ("l_linenumber", True)]
    got = scale.two_phase_topk_per_group(li, ["l_returnflag"], spec, k=7)
    from pyspark.sql import Window as W

    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    want = li.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 7)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_two_phase_topk_hot_group_partials_bounded(spark):
    """ONE grouping value over many partitions: each partition may emit
    at most k rows, so the final window ranks <= k * n_partitions rows —
    never the raw stream. Pinned by running phase 1 standalone."""
    n_part, k = 8, 3
    rows = [(i, "hot", float(i % 1000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(
        n_part
    )
    out = scale.two_phase_topk_per_group(
        df, ["g"], [("v", False), ("id", True)], k=k
    )
    # parity against a driver-side reference
    want = sorted(rows, key=lambda r: (-r[2], r[0]))[:k]
    got = sorted(
        (r.id, r.g, r.v) for r in out.collect()
    )
    assert got == sorted(want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # phase 1 really is the partial fold


def test_two_phase_topk_ties_are_deterministic(spark):
    """Equal scores: the unique tiebreaker decides membership, so
    repeated runs and the window form agree exactly."""
    rows = [(i, "g", 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(5)
    got = scale.two_phase_topk_per_group(df, ["g"], [("v", False), ("id", True)], 4)
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3]


def test_exact_weighted_quantiles_matches_naive(spark):
    """Weighted lower quantile vs a driver-side replay, including a
    heavily-skewed weight (one value carrying half the mass) and
    weight-1 degeneration to the unweighted lower quantile."""
    rows = [(float(v), (v % 7) + 1) for v in range(1, 200)]
    rows.append((42.0, 700))  # one value with huge weight
    df = spark.createDataFrame(rows, "v double, w long").repartition(6)
    probs = [0.1, 0.5, 0.9]
    got = {
        r.prob: r.value
        for r in scale.exact_weighted_quantiles(df, "v", "w", probs).collect()
    }
    # driver replay
    agg = {}
    for v, w in rows:
        agg[v] = agg.get(v, 0) + w
    tot = sum(agg.values())
    cum, cdf = 0, []
    for v in sorted(agg):
        cum += agg[v]
        cdf.append((v, cum))
    for p in probs:
        want = next(v for v, c in cdf if c >= p * tot)
        assert got[p] == want, (p, got[p], want)
    # the huge-weight value owns a wide quantile band
    assert got[0.5] == 42.0


def test_kmv_pane_merge_equals_direct_window_build(spark, sf_dir):
    """The sliding-window sketch identity: merging a window's per-day
    pane sketches equals sketching the window's raw rows directly —
    bottom-k of a union is the bottom-k of the unioned bottom-k's, so
    pane reuse is lossless (each day sketched once, never re-scanned)."""
    from les_etl_pipeline_spark.operators import sketches

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.col("user_id").cast("string").alias("uid"),
        )
    )
    k = 16
    daily = sketches.kmv_sketch(ev, ["day"], F.col("uid"), k=k)
    panes = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("day7"), "h"
    )
    anchors = daily.select(F.col("day").alias("day7")).distinct()
    merged = sketches.kmv_merge(
        panes.join(anchors, "day7", "left_semi"), ["day7"], k
    )
    # direct build: each window's raw rows sketched from scratch
    spine = ev.select("day").distinct().withColumnRenamed("day", "day7")
    raw7 = ev.join(
        spine,
        (F.col("day") <= F.col("day7")) & (F.col("day") >= F.date_sub("day7", 6)),
    )
    direct = sketches.kmv_sketch(raw7, ["day7"], F.col("uid"), k=k)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_two_phase_folds_survive_tiny_arrow_batches(spark):
    """Tiny Arrow batches force BOTH round-11 mapInPandas partial stages
    (skyline local prune, top-k fold) through their multi-batch
    fold-and-reprune path — a row in the answer must survive being
    pruned against an incomplete accumulator and re-proven later."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    rows = _points()
    df = spark.createDataFrame(
        rows, "id long, g string, mn double, mx double"
    ).repartition(3)
    try:
        spark.conf.set(conf, "17")
        sky = sorted(tuple(r) for r in skyline_2d(df, "mn", "mx").collect())
        topk = scale.two_phase_topk_per_group(
            df.where(F.col("mn").isNotNull()),
            ["g"],
            [("mx", False), ("mn", True), ("id", True)],
            k=5,
        )
        got_topk = sorted(map(tuple, topk.collect()))
    finally:
        spark.conf.set(conf, old)
    assert sky == [tuple(r) for r in _naive_skyline(rows, 2, 3)]
    from pyspark.sql import Window as W

    w = W.partitionBy("g").orderBy(F.col("mx").desc(), "mn", "id")
    want = (
        df.where(F.col("mn").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )
    assert got_topk == sorted(map(tuple, want.collect()))


def test_skyline_null_group_is_a_group(spark):
    """GROUP BY semantics for a NULL group key: its rows compete only
    with each other and survive into the result — a null-unsafe phase-2
    join would silently drop the whole group."""
    rows = [
        (1, None, 1.0, 5.0),
        (2, None, 2.0, 9.0),  # not dominated by (1.0, 5.0)
        (3, None, 3.0, 4.0),  # dominated by id=1 within the NULL group
        (4, "g1", 9.0, 1.0),  # alone in g1 -> survives
    ]
    df = spark.createDataFrame(rows, "id long, g string, mn double, mx double")
    got = sorted(r.id for r in skyline_2d(df, "mn", "mx", group_cols=["g"]).collect())
    assert got == [1, 2, 4]


def test_grouped_kll_null_group_is_a_group(spark):
    """GROUP BY semantics through the whole grouped KLL family: a NULL
    group key is aggregated like any other group, so the survivor / m /
    cut joins back onto the rows must be null-safe — a plain on-list
    join silently dropped the entire NULL group (the skyline had the
    same bug class)."""
    from les_etl_pipeline_spark.operators import sketches

    rows = [(None if i % 3 == 0 else "g1", float(i), str(i)) for i in range(90)]
    df = spark.createDataFrame(rows, "g string, x double, k string")
    sk = sketches.kll_build_grouped(df, ["g"], "x", F.col("k"), capacity=64)
    groups = {r.g for r in sk.select("g").distinct().collect()}
    assert groups == {None, "g1"}  # null group survives the build join
    q = sketches.kll_quantiles_grouped(sk, ["g"], [0.5])
    assert {r.g for r in q.collect()} == {None, "g1"}
    merged = sketches.kll_merge_grouped(sk, ["g"], capacity=64)
    assert {r.g for r in merged.select("g").distinct().collect()} == {None, "g1"}
    pm = sketches.kll_percentile_map_grouped(df, ["g"], "x", sk, n_cuts=10)
    assert pm.count() == 90  # every row scored, null group included


def test_mg_grouped_bounds_and_survival(spark):
    """Per-(partition, group) MG: each group's merged summary is <=
    capacity rows, and every value whose within-group count exceeds
    N_g/(capacity+1) survives — the ungrouped survival bound per group,
    under a capacity small enough to force decrements."""
    from les_etl_pipeline_spark.operators import sketches

    cap = 8
    rows = []
    for g in ("a", "b"):
        rows += [(g, "HEAVY")] * 60 + [(g, "WARM")] * 30
        rows += [(g, f"tail-{g}-{i}") for i in range(150)]
    df = spark.createDataFrame(rows, "g string, v string").repartition(6)
    merged = sketches.mg_merge_grouped(
        sketches.mg_candidates_grouped(df, ["g"], "v", capacity=cap), ["g"], cap
    )
    got = merged.collect()
    per_group = {}
    for r in got:
        per_group.setdefault(r.g, []).append(r)
    true = {(g, v): sum(1 for a, b in rows if (a, b) == (g, v)) for g, v in set(rows)}
    n_g = 240
    for g in ("a", "b"):
        assert len(per_group[g]) <= cap
        survivors = {r.value for r in per_group[g]}
        for (gg, v), c in true.items():
            if gg == g and c > n_g / (cap + 1):
                assert v in survivors, (g, v, c)
        for r in per_group[g]:
            assert 0 < r.lb <= true[(g, r.value)]


def test_heavy_hitters_sliding_matches_naive(spark):
    """Exact parity with the naive per-window recount on a synthetic
    stream with day-local heavies (globally light — the shape where
    global MG candidates would miss them), under a small capacity that
    forces per-day decrements. Completeness condition holds:
    min_freq > W/(cap+1) for every window."""
    import datetime

    from les_etl_pipeline_spark.operators import sketches

    d0 = datetime.date(2024, 3, 1)
    rows = []
    for di in range(10):
        d = d0 + datetime.timedelta(days=di)
        rows += [(d, f"burst-{di}")] * 40  # heavy on its day only
        rows += [(d, f"noise-{di}-{i}") for i in range(120)]
    df = spark.createDataFrame(rows, "day date, v string").repartition(5)
    # widest window W <= 7 * 160 = 1120 rows; capacity sized so the
    # completeness bound holds: W/(cap+1) = 1120/65 = 17.2 < min_freq
    cap, min_freq = 64, 30
    got = sorted(
        map(
            tuple,
            sketches.heavy_hitters_sliding(
                df, "day", "v", min_freq, window_days=7, capacity=cap
            ).collect(),
        )
    )
    # naive reference
    days = sorted({r[0] for r in rows})
    want = []
    for d in days:
        cnt: dict = {}
        for rd, v in rows:
            if d - datetime.timedelta(days=6) <= rd <= d:
                cnt[v] = cnt.get(v, 0) + 1
        want += [(d, v, c) for v, c in cnt.items() if c >= min_freq]
    assert got == sorted(want)


def test_grouped_weighted_quantiles_ties_zeros_null_group(spark):
    """The tie-free offset selection: zero-weight values create cum_w
    ties at group boundaries (the shape where a min_by on cum_w alone
    picks the wrong first-row weight and shifts the whole group's CDF);
    a NULL group key is a group. Verified against a driver replay."""
    rows = [
        # group "a": zero-weight value FIRST in value order, then ties
        ("a", 1.0, 0),
        ("a", 2.0, 3),
        ("a", 3.0, 0),  # cum ties with v=2.0
        ("a", 4.0, 7),
        # NULL group with real mass
        (None, 1.0, 4),
        (None, 5.0, 4),
        # group "b": single value
        ("b", 9.0, 2),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long").repartition(3)
    probs = [0.5, 0.9]
    got = {
        (r.g, r.prob): r.value
        for r in scale.exact_weighted_quantiles_grouped(
            df, ["g"], "v", "w", probs
        ).collect()
    }
    agg: dict = {}
    for g, v, w in rows:
        agg.setdefault(g, {})
        agg[g][v] = agg[g].get(v, 0) + w
    for g, vw in agg.items():
        tot = sum(vw.values())
        cum, cdf = 0, []
        for v in sorted(vw):
            cum += vw[v]
            cdf.append((v, cum))
        for p in probs:
            want = next(v for v, c in cdf if c >= p * tot)
            assert got[(g, p)] == want, (g, p, got[(g, p)], want)
    assert (None, 0.5) in got  # the NULL group survived every join


def test_two_phase_topk_null_order_keys_excluded(spark):
    """The null contract, enforced: Spark ranks NULLs first under ASC
    while the pandas fold's na_position puts them last — a null-keyed
    row would be pruned by phase 1 yet ranked first by the window form.
    The operator excludes such rows explicitly, so both phases agree."""
    rows = [(1, "g", None), (2, "g", 5.0), (3, "g", 1.0), (4, "g", None)]
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(2)
    got = scale.two_phase_topk_per_group(df, ["g"], [("v", True), ("id", True)], 3)
    assert sorted((r.id, r.rn) for r in got.collect()) == [(2, 2), (3, 1)]


def test_two_phase_topk_nan_order_keys_excluded(spark):
    """The NaN side of the null contract (VERDICT r11 ADVICE): Spark
    sorts NaN LARGEST (first under DESC) while the pandas fold treats it
    as NA and drops it to the end — so a NaN row surviving an under-full
    partition would outrank every real row in phase 2, making the result
    partition-layout-dependent. The operator must exclude NaN order keys
    just like NULLs, regardless of how rows land in partitions."""
    rows = [
        (1, "g", float("nan")),
        (2, "g", 5.0),
        (3, "g", 1.0),
        (4, "g", float("nan")),
        (5, "h", float("nan")),  # a group whose ONLY rows are NaN-keyed
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    for nparts in (1, 2, 5):  # layout-independence is the point
        got = scale.two_phase_topk_per_group(
            df.repartition(nparts), ["g"], [("v", False), ("id", True)], 3
        )
        assert sorted((r.id, r.rn) for r in got.collect()) == [(2, 1), (3, 2)]


def test_kmv_bottom_k_null_coins_excluded(spark):
    """A null key produces a null coin; the sketch must never carry it
    (it would outrank real coins under the window's ASC-nulls-first and
    inflate the estimator's count)."""
    from les_etl_pipeline_spark.operators import sketches

    rows = [("g", None if i % 5 == 0 else f"k{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, k string").repartition(3)
    sk = sketches.kmv_sketch(df, ["g"], F.col("k"), k=8)
    got = sk.collect()
    assert len(got) == 8 and all(r.h is not None for r in got)
    with pytest.raises(ValueError, match="group column"):
        sketches.kmv_sketch(df, [], F.col("k"), k=8)


def test_heavy_hitters_exact_grouped_matches_naive(spark):
    """Grouped exact HH under a capacity that forces per-group MG
    decrements: same rows as the plain grouped GROUP BY ... HAVING."""
    from les_etl_pipeline_spark.operators import sketches

    rows = []
    for g in ("a", "b"):
        rows += [(g, "HEAVY")] * 50 + [(g, f"WARM-{g}")] * 25
        rows += [(g, f"tail-{g}-{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v string").repartition(6)
    # N_g = 275; bound 275/(cap+1) = 16.2 < min_freq 20
    got = sorted(
        map(
            tuple,
            sketches.heavy_hitters_exact_grouped(
                df, ["g"], "v", min_freq=20, capacity=16
            ).collect(),
        )
    )
    want = sorted(
        [("a", "HEAVY", 50), ("a", "WARM-a", 25), ("b", "HEAVY", 50), ("b", "WARM-b", 25)]
    )
    assert got == want


def test_kmv_difference_tracks_exact(spark, sf_dir, duck):
    """Directed difference estimates vs DuckDB-exact |A \\ B| on the
    3-gram shingle sets: each pair's error is bounded by the KMV noise
    of its terms (a few rse's of the pair union size)."""
    from les_etl_pipeline_spark.operators import dedup as _dedup
    from les_etl_pipeline_spark.operators import sketches

    docs = table(spark, sf_dir, "documents")
    sh = docs.select("source", F.explode(_dedup.shingles("text", 3)).alias("sh"))
    k = 128
    sk = sketches.kmv_sketch(sh, ["source"], F.col("sh"), k=k)
    srcs = sorted(r.source for r in sh.select("source").distinct().collect())
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]],
        "src_a string, src_b string",
    )
    got = {
        (r.src_a, r.src_b): (r.a_not_b_est, r.b_not_a_est)
        for r in sketches.kmv_pairwise_difference(sk, "source", pairs, k=k).collect()
    }
    exact = duck.sql("""
        WITH tok AS (
          SELECT source, doc_id, unnest(string_split(text, ' ')) AS w,
                 unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
          FROM documents
        ), sh AS (
          SELECT DISTINCT source,
                 w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
          FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
          QUALIFY lead(w,2) OVER win IS NOT NULL
        )
        SELECT a.source, b.source,
               count(DISTINCT a.s) FILTER (WHERE b2.s IS NULL) AS anb
        FROM sh a
        JOIN (SELECT DISTINCT source FROM sh) b ON a.source < b.source
        LEFT JOIN sh b2 ON b2.source = b.source AND b2.s = a.s
        GROUP BY 1, 2
    """).fetchall()
    import math

    rse = 1.0 / math.sqrt(k - 2)
    checked = 0
    for sa, sb, anb in exact:
        if (sa, sb) not in got:
            continue
        est = got[(sa, sb)][0]
        # union size bounds the noise of both terms
        u = duck.sql(f"""
            WITH tok AS (
              SELECT doc_id, source, unnest(string_split(text, ' ')) AS w,
                     unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
              FROM documents WHERE source IN ('{sa}', '{sb}')
            ), sh AS (
              SELECT DISTINCT
                 w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
              FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
              QUALIFY lead(w,2) OVER win IS NOT NULL
            ) SELECT count(*) FROM sh
        """).fetchone()[0]
        assert abs(est - anb) <= 6 * rse * u + 2, (sa, sb, est, anb, u)
        checked += 1
    assert checked >= 3  # the fixture really has comparable pairs
