"""Scale-operator tests: plan-shape assertions (the thing that matters at
100 TB) plus result equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators import scale


def test_salted_agg_equals_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in scale.salted_agg(
            li, ["l_returnflag"], {"n": ("count", "l_quantity"), "s": ("sum", "l_quantity")}
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6


def test_salted_join_equals_plain(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    dim = spark.createDataFrame(
        [("F", "final"), ("O", "open"), ("P", "pending")], "st string, label string"
    )
    plain = sorted(
        (r["o_orderkey"], r["label"])
        for r in orders.join(dim, orders.o_orderstatus == dim.st).collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["label"])
        for r in scale.salted_join(
            orders.withColumn("st", F.col("o_orderstatus")), dim, on="st"
        ).collect()
    )
    assert plain == salted


def test_salted_agg_spreads_partitions(spark, sf_dir):
    """The phase-1 shuffle must group on (key, salt): distinct phase-1
    groups > distinct keys — the skew actually spread."""
    li = table(spark, sf_dir, "lineitem")
    salted = scale.with_salt(li, 16)
    n_groups = salted.select("l_returnflag", "_salt").distinct().count()
    assert n_groups > 3  # 3 keys alone would mean no spreading


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Bucketed tables joined on the bucket key: NO Exchange in the plan
    (co-located join — at 100 TB this removes the dominant shuffle).
    Auto-broadcast is disabled for the assertion: on test-sized data the
    planner prefers a broadcast (also shuffle-free), which would hide the
    bucketing path being exercised."""
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    scale.write_bucketed(orders, "b_orders", "o_orderkey", 4)
    scale.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 4
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = scale.bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_dedup_corpus_survivors(spark, sf_dir):
    """dedup_corpus: survivors ⊆ input, one doc per exact-normalized
    group, and no surviving near-dup pair above the threshold."""
    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.operators import dedup

    docs = table(spark, sf_dir, "documents")
    out = dedup.dedup_corpus(docs, fuzzy_threshold=0.4)
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out <= n_in
    # idempotent: dedup of the deduped corpus removes nothing
    again = dedup.dedup_corpus(out, fuzzy_threshold=0.4)
    assert again.count() == n_out


def test_cosine_lsh_pairs_no_nested_loop(spark, sf_dir):
    """No embedding-dedup pair generator other than the labeled 'exact'
    baseline may plan a BroadcastNestedLoopJoin (the quadratic
    scale-killer) — candidates come from equi-joins on bucket keys.
    Also pins the operator default to the bounded-expansion banded path
    (VERDICT r13 #1)."""
    import inspect

    from les_etl_pipeline_spark.operators import dedup, similarity

    assert (
        inspect.signature(dedup.embedding_cosine_dedup).parameters["method"].default
        == "banded"
    )
    emb = table(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_lsh_candidate_pairs(emb, 0.4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # sanity: the exact baseline IS the nested loop the default avoids
    exact_plan = (
        similarity.threshold_pairs(emb, 0.4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in exact_plan


def test_cosine_lsh_pairs_match_exact_in_baseline_mode(spark, sf_dir):
    """In explicit full-recall baseline mode (the measured-degenerate
    bucketLength=2.0 + allow_degenerate opt-in that the oracle-paired
    registry query pins) LSH candidates + exact re-check reproduce the
    exact all-pairs result; precision is exact by construction."""
    from les_etl_pipeline_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]) for r in similarity.threshold_pairs(emb, 0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_lsh_candidate_pairs(
            emb, 0.4, bucket_length=2.0, allow_degenerate=True
        ).collect()
    }
    assert lsh == exact
    assert len(exact) > 0


def test_cosine_lsh_degenerate_hashing_fails_loudly(spark, sf_dir):
    """VERDICT r13 #2: bucketLength=2.0 on unit vectors hashes the
    whole corpus into ~2 buckets — the fence must raise instead of
    silently running all-pairs candidates; the derived default bucket
    length must hash non-degenerately on the same vectors."""
    import pytest as _pytest

    from les_etl_pipeline_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError, match="degenerate hashing"):
        similarity.cosine_lsh_candidate_pairs(emb, 0.4, bucket_length=2.0).limit(
            1
        ).count()
    # derived default (UNIT_BUCKET_LENGTH) passes the fence and yields
    # a usable (non-empty) verified pair set
    pairs = similarity.cosine_lsh_candidate_pairs(emb, 0.4)
    assert pairs.count() > 0


def test_salted_join_rejects_outer_modes(spark):
    import pytest as _pytest

    from les_etl_pipeline_spark.operators import scale

    df = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with _pytest.raises(ValueError):
            scale.salted_join(df, small, "k", buckets=4, how=how)


def test_global_row_ids_plan_has_no_global_data_window(spark, sf_dir):
    """The data-scale window must be partitioned by _pid; the only
    ordered-unpartitioned window runs over the one-row-per-partition
    offset table (summing _n)."""
    from les_etl_pipeline_spark.catalog import table as _table
    from les_etl_pipeline_spark.operators.scale import global_row_ids

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    df = global_row_ids(docs, "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln and "row_number" in ln:
            assert "_pid" in ln, f"data window not partitioned: {ln.strip()}"
    # ids are exactly 1..n in key order
    rows = df.orderBy("doc_id").collect()
    assert [r["row_id"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [r["doc_id"] for r in rows]
    assert keys == sorted(keys)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Date-partitioned fact joined to a selectively-filtered dim on the
    partition column must plan DYNAMIC partition pruning (the runtime
    analogue of static pruning — at 100 TB the dim filter, unknown at
    compile time, must still cut the fact scan to the matching
    partitions instead of reading everything).

    Trigger conditions worth pinning (learned here): the filter must be
    one Catalyst deems "likely selective" (an equality/IN/comparison —
    a bare boolean attribute does NOT qualify), and the dim must be the
    broadcast build side (at test scale the planner would otherwise
    broadcast the tiny fact, leaving nothing to prune)."""
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.catalog import table

    fact_path = str(tmp_path / "events_by_day")
    (
        table(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    days = sorted(r.day for r in fact.select("day").distinct().collect())
    dim_path = str(tmp_path / "day_dim")
    spark.createDataFrame(
        [(d, "audit" if i % 7 == 0 else "normal") for i, d in enumerate(days)],
        "day date, kind string",
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    joined = (
        fact.join(F.broadcast(dim.where(F.col("kind") == "audit")), "day")
        .groupBy("day")
        .count()
    )
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized.lower(), optimized
    # the pruning subquery must survive into the physical plan (scan-line
    # PartitionFilters get truncated in toString, so match anywhere)
    physical = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in physical.lower(), physical
    assert joined.count() == sum(1 for i in range(len(days)) if i % 7 == 0)


def test_scan_pruning_reaches_parquet(spark, sf_dir):
    """Column pruning + predicate pushdown must reach the parquet
    FileScan: a 2-column projection with a selective filter reads a
    2-column ReadSchema and carries the predicate in PushedFilters —
    at 100 TB this is the difference between scanning 2 columns of the
    row groups that can match and scanning all 16 of every row group."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity," in plan, plan
    assert "ReadSchema: struct<l_orderkey:" in plan, plan
    # nothing beyond the two projected columns reaches the scan
    assert "l_extendedprice" not in plan


def test_join_strategy_hints_control_physical_plan(spark, sf_dir):
    """Join strategy is controllable per-join when the planner's default
    is wrong for a known workload: shuffle_hash avoids the sort of SMJ,
    merge forces SMJ, broadcast pins the build side. At 100 TB picking
    the strategy per join (not globally) is a first-order lever."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def plan(j):
            return j._jdf.queryExecution().executedPlan().toString()

        smj = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        assert "SortMergeJoin" in plan(smj)
        shj = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        assert "ShuffledHashJoin" in plan(shj)
        bhj = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        assert "BroadcastHashJoin" in plan(bhj)
        # all three compute the same row count
        counts = {smj.count(), shj.count(), bhj.count()}
        assert len(counts) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_runtime_bloom_filter_join_injection(spark, sf_dir):
    """Runtime row-level filtering: a selective dim filter injects a
    bloom_filter_agg semi-filter into the fact side of a shuffle join —
    DPP's counterpart for joins on NON-partition columns. At 100 TB this
    prunes most fact rows before the shuffle. Test scale sits under the
    default 10 GB application-side threshold, so the threshold is
    lowered to make the (normally size-gated) rewrite observable."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    thr = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    old_thr = spark.conf.get(thr)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(thr, "0")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            "o_totalprice > 400000"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, opt
        assert "might_contain" in opt, opt  # the fact-side membership probe
        j.count()  # and it still executes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(thr, old_thr)


def test_no_rdd_usage_outside_allowlist():
    """The engine is DataFrame-native: `.rdd` appears ONLY in the
    documented parallelism probe (metadata-only getNumPartitions). Any
    new `.rdd` use must be justified here — RDD hops break Catalyst
    optimization and whole-stage codegen."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "les_etl_pipeline_spark")
    hits = []
    for path in glob.glob(f"{root}/**/*.py", recursive=True):
        for i, line in enumerate(open(path), 1):
            if re.search(r"\.rdd\b", line):
                hits.append((os.path.relpath(path, root), i, line.strip()))
    allowed: set[tuple[str, str]] = set()  # no sanctioned .rdd uses remain
    for path, i, line in hits:
        assert any(p == path and frag in line for p, frag in allowed), (
            f"unexpected .rdd use at {path}:{i}: {line}"
        )


def test_exact_ntile_matches_window_ntile(spark):
    """exact_ntile must be bit-identical to ntile(k) OVER (ORDER BY ...)
    for awkward n/k combinations (uneven buckets, n < k, desc order)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.operators.scale import exact_ntile

    for n, k in ((10, 4), (7, 3), (3, 8), (32, 5), (1, 2)):
        df = spark.range(n).select(
            F.col("id").alias("i"), (F.col("id") * 37 % 11).alias("v")
        )
        want = {
            (r.i, r.b)
            for r in df.select(
                "i", F.ntile(k).over(W.orderBy(F.desc("v"), "i")).alias("b")
            ).collect()
        }
        got = {
            (r.i, r.bucket)
            for r in exact_ntile(df, [F.col("v").desc(), "i"], k).collect()
        }
        assert got == want, (n, k)


def test_global_row_ids_multi_key_desc(spark):
    """Composite (desc, asc) ordering assigns rank-in-total-order."""
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.operators.scale import global_row_ids

    rows = [(i, i % 5) for i in range(23)]
    df = spark.createDataFrame(rows, "i int, g int")
    out = global_row_ids(df, [F.col("g").desc(), "i"], id_name="r").collect()
    expect = sorted(rows, key=lambda t: (-t[1], t[0]))
    got = sorted(out, key=lambda r: r.r)
    assert [(r.i, r.g) for r in got] == expect
    assert [r.r for r in got] == list(range(1, 24))


def test_carried_cumsum_matches_window_on_large_value_grain(spark, sf_dir):
    """Regression for the boundary-sampling race: range boundaries are
    re-sampled per execution, so without the checkpoint the offsets
    branch and the join branch could disagree on _pid (reproduced on a
    ~10k-row value table; 500-row inputs sample exhaustively and never
    failed). Pins carried_cumsum to the single-task window cumsum."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from les_etl_pipeline_spark.catalog import table as _table
    from les_etl_pipeline_spark.operators.scale import carried_cumsum

    o = _table(spark, sf_dir, "orders")
    vg = o.groupBy(F.col("o_totalprice").alias("p")).agg(
        F.count(F.lit(1)).alias("c")
    )
    got = {r.p: r.cum_c for r in carried_cumsum(vg, "p", ["c"]).collect()}
    want = {
        r.p: r.w
        for r in vg.withColumn(
            "w", F.sum("c").over(W.orderBy("p").rowsBetween(W.unboundedPreceding, 0))
        ).collect()
    }
    assert got == want
