"""Round-9 sketch pack: the two bounded-state summaries the sketch tier
(`operators/sketches.py`) still lacked —

- ``sketch_heavy_hitters_exact``: EXACT heavy hitters without shuffling
  the long tail. Per-partition Misra-Gries summaries (bounded dict,
  batch-vectorized in one mapInPandas) generate a candidate set that
  provably contains every value with global frequency > N/(capacity+1);
  one exact counting scan restricted to the (broadcast) candidates then
  yields true counts. At 100 TB this replaces the full-key-space GROUP
  BY with a shuffle of <= capacity rows per partition plus a semi-join
  — the head is the answer, the tail never reaches a reducer. Output
  counts are exact, so the oracle is the plain GROUP BY ... HAVING.
- ``sketch_histogram_quantiles``: mergeable equi-width histogram
  quantile sketch — one 1-row min/max aggregate (a plan-provable scalar
  broadcast) + one binning scan into <= n_bins cells; quantiles
  interpolate inside the hit bin with error bounded by one bin width.
  The (bin, c) cell table merges across shards by union+sum exactly
  like the CMS cell table, and the whole post-scan computation touches
  metadata-scale rows only (the ordered window runs over <= n_bins
  histogram rows — allowlisted by that justification in the plan gate).
  Deterministic double math end to end, so DuckDB replays the estimates
  bit-exactly.

Reference parity: none (the reference has no sketch surface — SURVEY.md
§2.5 note; LLM-data/scale gap operators from the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..functions.ckpt import lazy_ckpt
from ..operators import panes, sketches
from .registry import register

HH_MIN_FREQ = 75
HH_CAPACITY = 2048

_HH_ORACLE = f"""
    SELECT user_id AS value, CAST(count(*) AS BIGINT) AS cnt
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id HAVING count(*) >= {HH_MIN_FREQ}
"""


@register("sketch_heavy_hitters_exact", oracle=_HH_ORACLE)
def sketch_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_freq={HH_MIN_FREQ} with capacity={HH_CAPACITY} keeps the MG
    completeness bound (min_freq > N/(capacity+1)) intact up to ~150k
    events — covering every fixture sf this query is graded at. Since
    r12 the bound is also CHECKED at runtime against the exact N (fold
    total markers): run at a larger sf than the sizing covers and the
    job aborts loudly instead of silently dropping a heavy hitter."""
    ev = table(spark, sf_dir, "events")
    return sketches.heavy_hitters_exact(
        ev, "user_id", min_freq=HH_MIN_FREQ, capacity=HH_CAPACITY
    )


HQ_BINS = 4096
HQ_PROBS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _hq_oracle() -> str:
    width = f"((hi - lo) / {float(HQ_BINS)!r})"
    per_p = "\n    UNION ALL\n".join(
        f"""
    (SELECT CAST({float(p)!r} AS DOUBLE) AS p,
           (floor((lo + {width} * (CAST(bin AS DOUBLE)
                 + (target - CAST(cum - c AS DOUBLE)) / CAST(c AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0) AS q
    FROM (SELECT *, CAST(ceil({float(p)!r} * total) AS DOUBLE) AS target FROM cum)
    WHERE cum >= target ORDER BY bin LIMIT 1)"""
        for p in HQ_PROBS
    )
    return f"""
    WITH mm AS MATERIALIZED (
      SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
             max(CAST(l_extendedprice AS DOUBLE)) AS hi
      FROM lineitem
    ), h AS MATERIALIZED (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo)
                                        / {width}) AS INT), {HQ_BINS - 1})
             END AS bin,
             lo, hi, count(*) AS c
      FROM lineitem, mm
      GROUP BY 1, 2, 3
    ), cum AS MATERIALIZED (
      SELECT *, sum(c) OVER (ORDER BY bin) AS cum, sum(c) OVER () AS total
      FROM h
    )
    {per_p}
    """


@register("sketch_histogram_quantiles", oracle=_hq_oracle())
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sk = sketches.histogram_build(li, "l_extendedprice", n_bins=HQ_BINS)
    return sketches.histogram_quantiles(sk, HQ_PROBS, n_bins=HQ_BINS)


KLL_CAPACITY = 4096
KLL_PROBS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _kll_oracle(capacity: int = KLL_CAPACITY, probs: list[float] | None = None) -> str:
    """Relational replay of the canonical KLL-family compactor
    (operators/sketches.py kll_build/kll_quantiles): per-item 60-bit md5
    coins, l* = min level whose survivor count fits capacity, survivor
    filter, then sample order statistics at ceil(p*m). Every stage is
    order-independent arithmetic, so DuckDB reproduces the sketch
    bit-exactly. The SAME single-build replay is the oracle for the
    shard-merge query: merge == single build is the sketch's defining
    property, so a merge defect (the r10 level-floor bug class) is a
    hash mismatch here, not a silent bias."""
    b = sketches.KLL_COIN_BITS
    KLL_CAP = capacity
    probs_rows = ",\n      ".join(
        f"(CAST({float(p)!r} AS DOUBLE))" for p in (probs or KLL_PROBS)
    )
    return f"""
    WITH base AS MATERIALIZED (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                 CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS u
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), cnts AS (
      SELECT ls.l,
             count(*) FILTER (WHERE u < (CAST(1 AS BIGINT) << ({b} - ls.l))) AS c
      FROM base CROSS JOIN (SELECT unnest(generate_series(0, {b})) AS l) ls
      GROUP BY ls.l
    ), lstar AS MATERIALIZED (
      SELECT min(l) AS lstar FROM cnts WHERE c <= {KLL_CAP}
    ), sk AS MATERIALIZED (
      SELECT v, u FROM base, lstar
      WHERE u < (CAST(1 AS BIGINT) << ({b} - lstar))
    ), ranked AS (
      SELECT v, row_number() OVER (ORDER BY v, u) AS rn,
             count(*) OVER () AS m
      FROM sk
    )
    SELECT t.p, ranked.v AS q
    FROM ranked JOIN (VALUES {probs_rows}) t(p)
      ON ranked.rn = CAST(ceil(t.p * ranked.m) AS BIGINT)
    """


KLLG_CAPACITY = 1024
KLLG_PROBS = [0.25, 0.5, 0.9]


def _kllg_oracle(
    capacity: int = KLLG_CAPACITY, probs: list[float] | None = None
) -> str:
    """Per-group replay of the grouped KLL-family sketch: identical coin
    / l* / order-statistic math, every stage keyed by l_returnflag.
    Doubles as the oracle for the grouped MERGE query — per-group merge
    == per-group single build is the defining property, so a per-group
    level-floor defect is a hash mismatch here."""
    b = sketches.KLL_COIN_BITS
    KLLG_CAP = capacity
    probs_rows = ",\n      ".join(
        f"(CAST({float(p)!r} AS DOUBLE))" for p in (probs or KLLG_PROBS)
    )
    return f"""
    WITH base AS MATERIALIZED (
      SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                 CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS u
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), cnts AS (
      SELECT g, ls.l,
             count(*) FILTER (WHERE u < (CAST(1 AS BIGINT) << ({b} - ls.l))) AS c
      FROM base CROSS JOIN (SELECT unnest(generate_series(0, {b})) AS l) ls
      GROUP BY g, ls.l
    ), lstar AS MATERIALIZED (
      SELECT g, min(l) AS lstar FROM cnts WHERE c <= {KLLG_CAP} GROUP BY g
    ), sk AS MATERIALIZED (
      SELECT base.g, v, u FROM base JOIN lstar ON lstar.g = base.g
      WHERE u < (CAST(1 AS BIGINT) << ({b} - lstar))
    ), ranked AS (
      SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, u) AS rn,
             count(*) OVER (PARTITION BY g) AS m
      FROM sk
    )
    SELECT ranked.g, t.p, ranked.v AS q
    FROM ranked JOIN (VALUES {probs_rows}) t(p)
      ON ranked.rn = CAST(ceil(t.p * ranked.m) AS BIGINT)
    """


@register("sketch_kll_quantiles_by_group", oracle=_kllg_oracle())
def sketch_kll_quantiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group rank quantiles from the grouped KLL-family sketch —
    l* chosen per l_returnflag group, every window partitioned by the
    group, equi-join survivor filter (no broadcasts of data, no
    unpartitioned windows): the per-domain quantile shape a 100 TB
    curation pipeline runs over length/quality columns."""
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    sk = sketches.kll_build_grouped(
        li.withColumn("g", F.col("l_returnflag")),
        ["g"],
        "l_extendedprice",
        key,
        capacity=KLLG_CAPACITY,
    )
    return sketches.kll_quantiles_grouped(sk, ["g"], KLLG_PROBS)


KMV_K = 128


def _kmv_oracle() -> str:
    """Relational replay of the KMV source-overlap report: 3-gram
    shingles (the llm_data3 lead-window shape), 60-bit md5 coins,
    per-source bottom-k, pair spine from the distinct source domain,
    union bottom-k, and the three estimates with identical double math
    (hround = floor(x*10^d + 0.5)/10^d)."""
    b = sketches.KLL_COIN_BITS
    scale = float((KMV_K - 1) * (1 << b))

    def hr(expr: str, d: int) -> str:
        m = 10.0 ** d
        return f"(floor(({expr}) * {m!r} + 0.5) / {m!r})"

    return f"""
    WITH tok AS (
      SELECT source, doc_id,
             unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ), sh AS (
      SELECT source,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
      FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(w, 2) OVER win IS NOT NULL
    ), hs AS MATERIALIZED (
      SELECT DISTINCT source, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM sh
    ), sk AS MATERIALIZED (
      SELECT source, h FROM hs
      QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= {KMV_K}
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM (SELECT DISTINCT source FROM hs) a
      JOIN (SELECT DISTINCT source FROM hs) b ON a.source < b.source
    ), u AS MATERIALIZED (
      SELECT p.src_a, p.src_b, s.h, 'a' AS side
      FROM pairs p JOIN sk s ON s.source = p.src_a
      UNION ALL
      SELECT p.src_a, p.src_b, s.h, 'b' AS side
      FROM pairs p JOIN sk s ON s.source = p.src_b
    ), bk AS MATERIALIZED (
      SELECT src_a, src_b, h FROM (SELECT DISTINCT src_a, src_b, h FROM u)
      QUALIFY row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) <= {KMV_K}
    ), stats AS (
      SELECT src_a, src_b, count(*) AS cu, max(h) AS hk
      FROM bk GROUP BY 1, 2
    ), shared AS (
      SELECT src_a, src_b, h FROM u
      GROUP BY 1, 2, 3 HAVING count(DISTINCT side) = 2
    ), sc AS (
      SELECT b.src_a, b.src_b, count(*) AS cs
      FROM bk b JOIN shared s
        ON s.src_a = b.src_a AND s.src_b = b.src_b AND s.h = b.h
      GROUP BY 1, 2
    ), est AS (
      SELECT st.src_a, st.src_b,
             CASE WHEN st.cu < {KMV_K} THEN CAST(st.cu AS DOUBLE)
                  ELSE {scale!r} / CAST(st.hk AS DOUBLE) END AS ue,
             CAST(coalesce(sc.cs, 0) AS DOUBLE) / CAST(st.cu AS DOUBLE) AS ju
      FROM stats st LEFT JOIN sc ON sc.src_a = st.src_a AND sc.src_b = st.src_b
    )
    SELECT src_a, src_b,
           {hr('ue', 2)} AS union_est,
           {hr('ju', 4)} AS jaccard_est,
           {hr('ju * ue', 2)} AS inter_est
    FROM est
    """


@register("sketch_kmv_source_overlap", oracle=_kmv_oracle())
def sketch_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source corpus overlap from KMV (bottom-k) sketches: per
    source, the 128 smallest md5 coins of its 3-gram shingles; per
    source pair, union / Jaccard / intersection distinct estimates —
    the 100 TB way to answer 'how much of corpus A is inside corpus B'
    for every pair without an exact distinct join per pair. The pair
    spine is the bounded source domain (driver-literal, broadcast
    equi-joins only — same doctrine as the JSD source-pair spine)."""
    from pyspark.sql import functions as F

    from ..operators import dedup as _dedup

    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "source", F.explode(_dedup.shingles("text", 3)).alias("sh")
    )
    # source DOMAIN from the sketch itself: a source has sketch rows iff
    # it has >= 1 shingle — the identical set the old doc-grain filter
    # (size(shingles) > 0) produced, but the spine collect now reads the
    # lazily checkpointed <= groups*k-row sketch instead of paying its
    # own full corpus scan (r15, guide §2.4; the distinct() computes
    # every partition, satisfying the lazy_ckpt contract). One corpus
    # scan total: spine + both pair-join sides + the union's consumers
    # all read the same cut.
    sk = lazy_ckpt(sketches.kmv_sketch(sh, ["source"], F.col("sh"), k=KMV_K))
    srcs = sorted(r.source for r in sk.select("source").distinct().collect())
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]],
        "src_a string, src_b string",
    )
    return sketches.kmv_pairwise_overlap(sk, "source", pairs, k=KMV_K)


@register("sketch_kll_quantiles", oracle=_kll_oracle())
def sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass range-free rank-quantile sketch over extended price: the
    canonical KLL-family compactor (per-item seeded md5 coins — see
    operators/sketches.py for the exact-mergeability trade), capacity
    {KLL_CAPACITY}. Unlike sketch_histogram_quantiles this needs no
    min/max pre-scan and no fixed range; error is a rank bound."""
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    sk = sketches.kll_build(li, "l_extendedprice", key, capacity=KLL_CAPACITY)
    return sketches.kll_quantiles(sk, KLL_PROBS)


KLLM_CAPACITY = 512
KLLM_PROBS = [0.1, 0.5, 0.9, 0.99]


@register("sketch_kll_merge_fold", oracle=_kll_oracle(KLLM_CAPACITY, KLLM_PROBS))
def sketch_kll_merge_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE path under the oracle gate (VERDICT r10 #7): three
    deliberately asymmetric shards (~90% / ~9% / ~1% of order keys —
    the streaming MV's 'small micro-batch folds into compacted history'
    steady state) are sketched per shard and MERGED through
    ``kll_merge`` — the same merge math ``sketch_mv_sink`` folds
    batches with (n-way == left fold, pinned in
    tests/test_sketches_merge_fold_equivalence.py). The
    oracle is the single-build replay over the whole table: merge ==
    single build is the sketch's defining property, so the r10
    mixed-rate-sample bug class can never land silently again — it
    would hash-mismatch here (p99 moved ~50x in the r10 repro).
    Capacity {KLLM_CAPACITY} compacts the big shard several levels
    deeper than the 1% shard at every graded sf."""
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    m = F.col("l_orderkey") % 100
    # r14 second pass (guide §2.3 + §1.2): the three shard sketches are
    # built by ONE grouped build keyed on the shard tag instead of three
    # independent kll_build calls. Each per-shard kll_build read the base
    # twice (61-count aggregate + survivor filter), so even with the
    # thread-pooled concurrent materializations (the first r14 change
    # here) the query scanned lineitem six times; the grouped build's
    # per-group counts / per-group l* / survivor join are the SAME math
    # per shard (kll_build_grouped is kll_build generalized to a group
    # key), so the shard sketch rows are bit-identical and two scans
    # replace six. The n-way kll_merge then consumes the lazily
    # checkpointed union exactly as it consumed the three unioned shard
    # frames: rows carry each shard's own lstar, the floor is their max,
    # and the fold-equivalence pin in
    # tests/test_sketches_merge_fold_equivalence.py still covers the
    # merge math. The when() tags replay the shard predicates exactly
    # (rows with a NULL tag are dropped, as the old where()s dropped
    # them).
    shard = F.when(m < 90, 0).when((m >= 90) & (m < 99), 1).when(m == 99, 2)
    tagged = li.withColumn("shard", shard).where(F.col("shard").isNotNull())
    grouped = sketches.kll_build_grouped(
        tagged, ["shard"], "l_extendedprice", key, capacity=KLLM_CAPACITY
    )
    builds = grouped.select("v", "u", "lstar").localCheckpoint(eager=False)
    folded = sketches.kll_merge(builds, capacity=KLLM_CAPACITY)
    return sketches.kll_quantiles(folded, KLLM_PROBS)


KLLGM_CAPACITY = 256
KLLGM_PROBS = [0.25, 0.5, 0.9]


@register(
    "sketch_kll_merge_fold_by_group",
    oracle=_kllg_oracle(KLLGM_CAPACITY, KLLGM_PROBS),
)
def sketch_kll_merge_fold_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED merge path under the oracle gate (VERDICT r10 #4):
    two asymmetric shards (~99% / ~1% of order keys) of per-returnflag
    grouped sketches merged via ``kll_merge_grouped``, whose level
    floor is applied PER GROUP (each group's merged l* search starts at
    that group's own max shard depth). The oracle is the grouped
    single-build replay — per-group merge == per-group single build."""
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem").withColumn("g", F.col("l_returnflag"))
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    # r14 second pass (guide §2.3 + §1.2, same rewrite as
    # sketch_kll_merge_fold): both shards build in ONE grouped pass
    # keyed on (g, shard) — per-(g, shard) counts / l* / survivors are
    # the same math as two separate per-g builds on big/tiny, so the
    # unioned sketch rows are bit-identical and two scans replace four.
    # kll_merge_grouped then groups by g alone: each g's floor is the
    # max lstar across its two shard sketches, exactly as before.
    shard = F.when(F.col("l_orderkey") % 100 != 0, 0).when(
        F.col("l_orderkey") % 100 == 0, 1
    )
    tagged = li.withColumn("shard", shard).where(F.col("shard").isNotNull())
    both = sketches.kll_build_grouped(
        tagged, ["g", "shard"], "l_extendedprice", key, capacity=KLLGM_CAPACITY
    )
    merged = sketches.kll_merge_grouped(
        both.select("g", "v", "u", "lstar").localCheckpoint(eager=False),
        ["g"],
        capacity=KLLGM_CAPACITY,
    ).localCheckpoint(eager=False)
    return sketches.kll_quantiles_grouped(merged, ["g"], KLLGM_PROBS)


KLLC_VALUES = [2000.0, 10000.0, 30000.0, 60000.0, 90000.0]


def _kll_cdf_oracle() -> str:
    """Replay of the rank sketch's CDF read: same coins -> l* ->
    survivors as `_kll_oracle`, then one conditional fraction per probe
    value (hround 6dp) — no window at all."""
    b = sketches.KLL_COIN_BITS
    vals = ",\n      ".join(f"(CAST({float(x)!r} AS DOUBLE))" for x in KLLC_VALUES)
    return f"""
    WITH base AS MATERIALIZED (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                 CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS u
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), cnts AS (
      SELECT ls.l,
             count(*) FILTER (WHERE u < (CAST(1 AS BIGINT) << ({b} - ls.l))) AS c
      FROM base CROSS JOIN (SELECT unnest(generate_series(0, {b})) AS l) ls
      GROUP BY ls.l
    ), lstar AS MATERIALIZED (
      SELECT min(l) AS lstar FROM cnts WHERE c <= {KLL_CAPACITY}
    ), sk AS MATERIALIZED (
      SELECT v FROM base, lstar
      WHERE u < (CAST(1 AS BIGINT) << ({b} - lstar))
    )
    SELECT t.v,
           (floor((CAST(count(*) FILTER (WHERE sk.v <= t.v) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5)
            / 1000000.0) AS cdf
    FROM sk CROSS JOIN (VALUES {vals}) t(v)
    GROUP BY t.v
    """


@register("sketch_kll_cdf", oracle=_kll_cdf_oracle())
def sketch_kll_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank sketch's INVERSE read: estimated CDF at fixed probe
    values — 'what fraction of prices are under X' without a full sort
    or a second sketch. One conditional-count aggregate over the
    <= capacity survivor sample, no window (cheaper than the quantile
    direction, same Bernoulli rank-error bound)."""
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    sk = sketches.kll_build(li, "l_extendedprice", key, capacity=KLL_CAPACITY)
    return sketches.kll_cdf(sk, KLLC_VALUES)


PCT_CUTS = 100
PCT_CAPACITY = 2048


def _pct_oracle() -> str:
    """Replay of the sketch-broadcast percentile map: coins -> l* ->
    survivors -> 100 equi-probability order-statistic cut points ->
    per-row (cuts <= value)/100, 6dp hround. The cut-point derivation
    is the `_kll_oracle` order-statistic stage; the scoring join is a
    theta-join aggregated per row (bounded: 100 cuts per row)."""
    b = sketches.KLL_COIN_BITS
    probs_rows = ",\n      ".join(
        f"(CAST({float((j + 1) / PCT_CUTS)!r} AS DOUBLE))" for j in range(PCT_CUTS)
    )
    return f"""
    WITH base AS MATERIALIZED (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DOUBLE) AS v,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                 CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS u
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), cnts AS (
      SELECT ls.l,
             count(*) FILTER (WHERE u < (CAST(1 AS BIGINT) << ({b} - ls.l))) AS c
      FROM base CROSS JOIN (SELECT unnest(generate_series(0, {b})) AS l) ls
      GROUP BY ls.l
    ), lstar AS MATERIALIZED (
      SELECT min(l) AS lstar FROM cnts WHERE c <= {PCT_CAPACITY}
    ), sk AS MATERIALIZED (
      SELECT v, u FROM base, lstar
      WHERE u < (CAST(1 AS BIGINT) << ({b} - lstar))
    ), ranked AS (
      SELECT v, row_number() OVER (ORDER BY v, u) AS rn,
             count(*) OVER () AS m
      FROM sk
    ), cuts AS MATERIALIZED (
      SELECT ranked.v AS cut
      FROM ranked JOIN (VALUES {probs_rows}) t(p)
        ON ranked.rn = CAST(ceil(t.p * ranked.m) AS BIGINT)
    )
    SELECT b.l_orderkey, b.l_linenumber,
           (floor((CAST((SELECT count(*) FROM cuts WHERE cut <= b.v) AS DOUBLE)
                   / {float(PCT_CUTS)!r}) * 1000000.0 + 0.5) / 1000000.0) AS pct
    FROM base b
    """


@register("sketch_percentile_normalize", oracle=_pct_oracle())
def sketch_percentile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row percentile normalization via the rank sketch as a
    broadcast — 'tag every line item with its price percentile' with
    ZERO shuffle on the data path: 100 equi-probability cut points from
    the sketch become one array literal, each row scores itself with a
    single F.aggregate expression (whole-stage codegen, no window, no
    sort). The 100 TB shape for quality-score percentile gating, where
    exact_ntile's global range exchange is unnecessary precision."""
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    sk = sketches.kll_build(li, "l_extendedprice", key, capacity=PCT_CAPACITY)
    return sketches.kll_percentile_map(
        li.where(F.col("l_extendedprice").isNotNull()),
        "l_extendedprice",
        sk,
        n_cuts=PCT_CUTS,
    ).select("l_orderkey", "l_linenumber", "pct")


KLLCG_VALUES = [200.0, 500.0, 900.0]
KLLCG_CAPACITY = 512


def _kll_cdf_grouped_oracle() -> str:
    """Per-group replay of the grouped CDF read over document lengths:
    grouped coins -> per-group l* -> per-group survivor fractions."""
    b = sketches.KLL_COIN_BITS
    vals = ",\n      ".join(f"(CAST({float(x)!r} AS DOUBLE))" for x in KLLCG_VALUES)
    return f"""
    WITH base AS MATERIALIZED (
      SELECT source AS g, CAST(n_chars AS DOUBLE) AS v,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS u
      FROM documents WHERE n_chars IS NOT NULL
    ), cnts AS (
      SELECT g, ls.l,
             count(*) FILTER (WHERE u < (CAST(1 AS BIGINT) << ({b} - ls.l))) AS c
      FROM base CROSS JOIN (SELECT unnest(generate_series(0, {b})) AS l) ls
      GROUP BY g, ls.l
    ), lstar AS MATERIALIZED (
      SELECT g, min(l) AS lstar FROM cnts WHERE c <= {KLLCG_CAPACITY} GROUP BY g
    ), sk AS MATERIALIZED (
      SELECT base.g, v FROM base JOIN lstar ON lstar.g = base.g
      WHERE u < (CAST(1 AS BIGINT) << ({b} - lstar))
    )
    SELECT sk.g AS source, t.v,
           (floor((CAST(count(*) FILTER (WHERE sk.v <= t.v) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5)
            / 1000000.0) AS cdf
    FROM sk CROSS JOIN (VALUES {vals}) t(v)
    GROUP BY sk.g, t.v
    """


@register("sketch_kll_cdf_by_group", oracle=_kll_cdf_grouped_oracle())
def sketch_kll_cdf_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source CDF at fixed length thresholds ('what share of each
    source's documents are under 200/500/900 chars') — one grouped
    conditional-count aggregate over the per-group survivor samples, no
    window. Completes the grouped/ungrouped matrix across quantiles,
    CDF, percentile-map, and merge."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    sk = sketches.kll_build_grouped(
        docs, ["source"], "n_chars", F.col("doc_id").cast("string"),
        capacity=KLLCG_CAPACITY,
    )
    return sketches.kll_cdf_grouped(sk, ["source"], KLLCG_VALUES)


GPCT_CUTS = 100
GPCT_CAPACITY = 512


def _gpct_oracle() -> str:
    """Per-group replay of the grouped percentile map over document
    lengths: grouped coins -> per-group l* -> per-group cut points ->
    per-row (group's cuts <= value)/n, 6dp hround."""
    b = sketches.KLL_COIN_BITS
    probs_rows = ",\n      ".join(
        f"(CAST({float((j + 1) / GPCT_CUTS)!r} AS DOUBLE))"
        for j in range(GPCT_CUTS)
    )
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, source AS g, CAST(n_chars AS DOUBLE) AS v,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS u
      FROM documents WHERE n_chars IS NOT NULL
    ), cnts AS (
      SELECT g, ls.l,
             count(*) FILTER (WHERE u < (CAST(1 AS BIGINT) << ({b} - ls.l))) AS c
      FROM base CROSS JOIN (SELECT unnest(generate_series(0, {b})) AS l) ls
      GROUP BY g, ls.l
    ), lstar AS MATERIALIZED (
      SELECT g, min(l) AS lstar FROM cnts WHERE c <= {GPCT_CAPACITY} GROUP BY g
    ), sk AS MATERIALIZED (
      SELECT base.g, v, u FROM base JOIN lstar ON lstar.g = base.g
      WHERE u < (CAST(1 AS BIGINT) << ({b} - lstar))
    ), ranked AS (
      SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, u) AS rn,
             count(*) OVER (PARTITION BY g) AS m
      FROM sk
    ), cuts AS MATERIALIZED (
      SELECT g, ranked.v AS cut
      FROM ranked JOIN (VALUES {probs_rows}) t(p)
        ON ranked.rn = CAST(ceil(t.p * ranked.m) AS BIGINT)
    ), scored AS (
      SELECT b2.doc_id, count(*) AS c
      FROM base b2 JOIN cuts ON cuts.g = b2.g AND cuts.cut <= b2.v
      GROUP BY b2.doc_id
    )
    SELECT b.doc_id, b.g AS source,
           (floor((CAST(coalesce(s.c, 0) AS DOUBLE) / {float(GPCT_CUTS)!r})
                  * 1000000.0 + 0.5) / 1000000.0) AS pct
    FROM base b LEFT JOIN scored s ON s.doc_id = b.doc_id
    """


@register("sketch_percentile_normalize_by_group", oracle=_gpct_oracle())
def sketch_percentile_normalize_by_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-SOURCE length percentiles for every document — 'keep the top
    20% longest per source' without any per-group sort of the data:
    each source's 100 cut points ride one broadcast row as a sorted
    array, rows score themselves with one F.aggregate. The grouped
    quality-gating shape (per-language thresholds) at corpus scale."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    sk = sketches.kll_build_grouped(
        docs, ["source"], "n_chars", F.col("doc_id").cast("string"),
        capacity=GPCT_CAPACITY,
    )
    return sketches.kll_percentile_map_grouped(
        docs.where(F.col("n_chars").isNotNull()),
        ["source"],
        "n_chars",
        sk,
        n_cuts=GPCT_CUTS,
    ).select("doc_id", "source", "pct")


def _kmv_distinct_oracle() -> str:
    """Single-build replay of the per-source KMV distinct estimate —
    the oracle for the MERGE query: bottom-k of a union is the bottom-k
    of the unioned per-shard bottom-k's, so the merged sketch's
    estimate equals the single build's bit-for-bit."""
    b = sketches.KLL_COIN_BITS
    scale = float((KMV_K - 1) * (1 << b))
    return f"""
    WITH tok AS (
      SELECT source, doc_id,
             unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ), sh AS (
      SELECT source,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
      FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(w, 2) OVER win IS NOT NULL
    ), hs AS MATERIALIZED (
      SELECT DISTINCT source, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM sh
    ), sk AS MATERIALIZED (
      SELECT source, h FROM hs
      QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= {KMV_K}
    ), agg AS (
      SELECT source, count(*) AS c, max(h) AS hk FROM sk GROUP BY source
    )
    SELECT source,
           (floor((CASE WHEN c < {KMV_K} THEN CAST(c AS DOUBLE)
                        ELSE {scale!r} / CAST(hk AS DOUBLE) END)
                  * 100.0 + 0.5) / 100.0) AS n_distinct_est
    FROM agg
    """


@register("sketch_kmv_merge_fold", oracle=_kmv_distinct_oracle())
def sketch_kmv_merge_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV merge path (now two-phase bottom-k) under the oracle
    gate: per-source sketches built on two hash-split shards of the
    shingle stream, merged via ``kmv_merge``, then the per-source
    distinct estimate. The oracle replays the SINGLE build — merge is
    exact by the bottom-k union identity, so any defect in the
    two-phase partial/exact split is a hash mismatch here."""
    from pyspark.sql import functions as F

    from ..operators import dedup as _dedup

    docs = table(spark, sf_dir, "documents")
    sh = docs.select("source", F.explode(_dedup.shingles("text", 3)).alias("sh"))
    a = sh.where(F.crc32("sh") % 2 == 0)
    b = sh.where(F.crc32("sh") % 2 == 1)
    merged = sketches.kmv_merge(
        sketches.kmv_sketch(a, ["source"], F.col("sh"), k=KMV_K).unionByName(
            sketches.kmv_sketch(b, ["source"], F.col("sh"), k=KMV_K)
        ),
        ["source"],
        KMV_K,
    )
    return sketches.kmv_distinct_estimate(merged, ["source"], KMV_K)


KMVS_K = 64


def _kmv_sliding_oracle() -> str:
    """Relational replay of the pane-merged sliding distinct: per-day
    bottom-k sketches of user coins, a 7-day pane join, per-window
    re-bottom-k, and the exact-under-k / (k-1)-normalized estimator."""
    b = sketches.KLL_COIN_BITS
    scale = float((KMVS_K - 1) * (1 << b))

    return f"""
    WITH hs AS MATERIALIZED (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
      WHERE user_id IS NOT NULL
    ), sk AS MATERIALIZED (
      SELECT day, h FROM hs
      QUALIFY row_number() OVER (PARTITION BY day ORDER BY h) <= {KMVS_K}
    ), panes AS (
      SELECT d.day AS day7, s.h
      FROM (SELECT DISTINCT day FROM hs) d
      JOIN sk s ON s.day BETWEEN d.day - 6 AND d.day
    ), merged AS (
      SELECT day7, h FROM (SELECT DISTINCT day7, h FROM panes)
      QUALIFY row_number() OVER (PARTITION BY day7 ORDER BY h) <= {KMVS_K}
    ), stats AS (
      SELECT day7, count(*) AS c, max(h) AS hk FROM merged GROUP BY day7
    )
    SELECT day7 AS day,
           (floor((CASE WHEN c < {KMVS_K} THEN CAST(c AS DOUBLE)
                        ELSE {scale!r} / CAST(hk AS DOUBLE) END)
                  * 100.0 + 0.5) / 100.0) AS users_7d_est
    FROM stats
    """


@register("sketch_kmv_sliding_distinct", oracle=_kmv_sliding_oracle())
def sketch_kmv_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from PANE-MERGED KMV
    sketches — the mergeable-sketch tier of the rolling non-additive
    metric. ``events_sliding_distinct_users`` is the exact twin: it
    slides day-grain USER SETS, whose width grows with true
    cardinality. Here each day is sketched ONCE (two-phase bottom-k on
    the raw scan, <= k coins out per day) and each window is the
    ``kmv_merge`` of its 7 panes — per-window state is <= 7k coin rows
    no matter how many users a day saw, and no raw event is ever read
    twice. Exact below k per window, ~1/sqrt(k-2) rse above; the md5
    coins make every estimate oracle-replayable (the HLL twin,
    ``agg_hll_sketch_union``, is rows-only for exactly that reason)."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    daily = sketches.kmv_sketch(
        ev.select(F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"),
        ["day"],
        F.col("user_id").cast("string"),
        k=KMVS_K,
    )
    merged = panes.sliding_pane_merge(
        daily, "day", 7, lambda p: sketches.kmv_merge(p, ["day7"], KMVS_K)
    )
    est = sketches.kmv_distinct_estimate(merged, ["day7"], KMVS_K)
    return est.select(
        F.col("day7").alias("day"), F.col("n_distinct_est").alias("users_7d_est")
    )


KLLS_CAPACITY = 256
KLLS_PROBS = [0.5, 0.9, 0.99]


def _kll_sliding_oracle() -> str:
    """Per-window SINGLE-BUILD replay of the pane-merged sliding rank
    sketch: the Spark side builds one sketch per day and kll-merges the
    7 panes of each trailing window, while this oracle sketches each
    window's raw rows from scratch — they can only hash-match because
    merge == single build (the level-floored merge's defining property),
    so the r10 mixed-rate bug class is driver-graded here in the exact
    shape that produced it (a window mixes deep-compacted busy days
    with shallow quiet days)."""
    b = sketches.KLL_COIN_BITS
    probs_rows = ",\n      ".join(
        f"(CAST({float(p)!r} AS DOUBLE))" for p in KLLS_PROBS
    )
    return f"""
    WITH ev AS MATERIALIZED (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(value AS DOUBLE) AS v,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS u
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
    ), wins AS (SELECT DISTINCT day AS day7 FROM ev
    ), base AS MATERIALIZED (
      SELECT w.day7, e.v, e.u
      FROM wins w JOIN ev e ON e.day BETWEEN w.day7 - 6 AND w.day7
    ), cnts AS (
      SELECT day7, ls.l,
             count(*) FILTER (WHERE u < (CAST(1 AS BIGINT) << ({b} - ls.l))) AS c
      FROM base CROSS JOIN (SELECT unnest(generate_series(0, {b})) AS l) ls
      GROUP BY day7, ls.l
    ), lstar AS MATERIALIZED (
      SELECT day7, min(l) AS lstar FROM cnts WHERE c <= {KLLS_CAPACITY} GROUP BY day7
    ), sk AS MATERIALIZED (
      SELECT b2.day7, v, u FROM base b2 JOIN lstar s ON b2.day7 = s.day7
      WHERE u < (CAST(1 AS BIGINT) << ({b} - s.lstar))
    ), ranked AS (
      SELECT day7, v,
             row_number() OVER (PARTITION BY day7 ORDER BY v, u) AS rn,
             count(*) OVER (PARTITION BY day7) AS m
      FROM sk
    )
    SELECT ranked.day7 AS day, t.p, ranked.v AS q
    FROM ranked JOIN (VALUES {probs_rows}) t(p)
      ON ranked.rn = CAST(ceil(t.p * ranked.m) AS BIGINT)
    """


@register("sketch_kll_sliding_quantiles", oracle=_kll_sliding_oracle())
def sketch_kll_sliding_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day value quantiles per day from PANE-MERGED rank
    sketches: each day is sketched ONCE (one grouped build over the raw
    scan), and each window is the level-floored ``kll_merge_grouped`` of
    its <= 7 pane sketches — per-window state is bounded by capacity +
    pane survivors, and raw events are never re-scanned per window (the
    naive form re-reads every event ~7x; the oracle does exactly that).
    This is the sliding-window face of the merge fold: busy days
    compact deeper than quiet days, so every window merge is the
    asymmetric shape the r10 level-floor fix exists for."""
    from pyspark.sql import functions as F

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            "value",
            "event_id",
        )
    )
    daily = sketches.kll_build_grouped(
        ev, ["day"], "value", F.col("event_id").cast("string"), capacity=KLLS_CAPACITY
    )
    merged = panes.sliding_pane_merge(
        daily,
        "day",
        7,
        lambda p: sketches.kll_merge_grouped(p, ["day7"], capacity=KLLS_CAPACITY),
    )
    out = sketches.kll_quantiles_grouped(merged, ["day7"], KLLS_PROBS)
    return out.select(F.col("day7").alias("day"), "p", "q")


HHS_MIN_FREQ = 25
HHS_CAPACITY = 4096


@register(
    "sketch_heavy_hitters_sliding",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
      WHERE ts IS NOT NULL
    )
    SELECT d.day, e.user_id AS value, CAST(count(*) AS BIGINT) AS cnt
    FROM days d
    JOIN events e
      ON CAST(date_trunc('day', e.ts) AS DATE) BETWEEN d.day - 6 AND d.day
    WHERE e.user_id IS NOT NULL
    GROUP BY d.day, e.user_id
    HAVING count(*) >= {HHS_MIN_FREQ}
    """,
)
def sketch_heavy_hitters_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy users per trailing-7-day window, pane-shared: per-day
    MG candidates (grouped fold + per-day merge, <= capacity rows per
    day), ONE exact counting scan restricted to the broadcast candidate
    union, then pane sums per window — the stream is read once while
    the oracle's naive form re-reads every event 7x. Completeness holds
    whenever min_freq={HHS_MIN_FREQ} > W/(capacity+1) per window
    (pigeonhole over the panes' MG survival bounds: a window-heavy value
    is day-heavy somewhere) — capacity sized off the widest window at
    the largest benched scale (sf0.1: W ~ 35k, bound 8.5 < 25, ~3x
    margin); output counts are exact regardless, so the oracle is the
    plain window join GROUP BY ... HAVING. Since r12 the per-window
    bound is checked at runtime against exact pane totals — an
    undersized capacity at a bigger sf aborts loudly."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    )
    return sketches.heavy_hitters_sliding(
        ev, "day", "user_id", HHS_MIN_FREQ, window_days=7, capacity=HHS_CAPACITY
    )


HHG_MIN_FREQ = 18
HHG_CAPACITY = 4096


@register(
    "sketch_heavy_hitters_by_type",
    oracle=f"""
    SELECT event_type, user_id AS value, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type, user_id
    HAVING count(*) >= {HHG_MIN_FREQ}
    """,
)
def sketch_heavy_hitters_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy users per event type without shuffling each type's
    long tail: per-(partition, type) Misra-Gries folds merged to <=
    {HHG_CAPACITY} candidates per type, one broadcast-semi-joined exact
    counting scan, HAVING over true counts. Completeness per type
    whenever min_freq > N_type/(capacity+1) — capacity is sized off the
    LARGEST benched scale (sf0.1: N_type ~ 30k, bound 7.3 < 18 with a
    2.5x margin; at bigger N, size capacity ~ N_type/min_freq the same
    way). The oracle is the plain grouped GROUP BY ... HAVING whose
    shuffle carries every (type, user) pair. Since r12 the per-group
    bound is checked at runtime against exact N_g — an undersized
    capacity at a bigger sf aborts loudly."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    return sketches.heavy_hitters_exact_grouped(
        ev, ["event_type"], "user_id", HHG_MIN_FREQ, capacity=HHG_CAPACITY
    )


def _kmv_diff_oracle() -> str:
    """Replay of the directed A-not-B estimates: same shingle/coin/
    bottom-k CTEs as the overlap oracle, plus per-source estimates from
    each source's own sketch; difference = max(0, est_src - ju*ue)."""
    b = sketches.KLL_COIN_BITS
    scale = float((KMV_K - 1) * (1 << b))

    def hr(expr: str, d: int) -> str:
        m = 10.0 ** d
        return f"(floor(({expr}) * {m!r} + 0.5) / {m!r})"

    return f"""
    WITH tok AS (
      SELECT source, doc_id,
             unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ), sh AS (
      SELECT source,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
      FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(w, 2) OVER win IS NOT NULL
    ), hs AS MATERIALIZED (
      SELECT DISTINCT source, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM sh
    ), sk AS MATERIALIZED (
      SELECT source, h FROM hs
      QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= {KMV_K}
    ), srcest AS (
      SELECT source,
             CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
                  ELSE {scale!r} / CAST(max(h) AS DOUBLE) END AS es
      FROM sk GROUP BY source
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM (SELECT DISTINCT source FROM hs) a
      JOIN (SELECT DISTINCT source FROM hs) b ON a.source < b.source
    ), u AS MATERIALIZED (
      SELECT p.src_a, p.src_b, s.h, 'a' AS side
      FROM pairs p JOIN sk s ON s.source = p.src_a
      UNION ALL
      SELECT p.src_a, p.src_b, s.h, 'b' AS side
      FROM pairs p JOIN sk s ON s.source = p.src_b
    ), bk AS MATERIALIZED (
      SELECT src_a, src_b, h FROM (SELECT DISTINCT src_a, src_b, h FROM u)
      QUALIFY row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) <= {KMV_K}
    ), stats AS (
      SELECT src_a, src_b, count(*) AS cu, max(h) AS hk
      FROM bk GROUP BY 1, 2
    ), shared AS (
      SELECT src_a, src_b, h FROM u
      GROUP BY 1, 2, 3 HAVING count(DISTINCT side) = 2
    ), sc AS (
      SELECT b.src_a, b.src_b, count(*) AS cs
      FROM bk b JOIN shared s
        ON s.src_a = b.src_a AND s.src_b = b.src_b AND s.h = b.h
      GROUP BY 1, 2
    ), est AS (
      SELECT st.src_a, st.src_b,
             (CAST(coalesce(sc.cs, 0) AS DOUBLE) / CAST(st.cu AS DOUBLE))
             * (CASE WHEN st.cu < {KMV_K} THEN CAST(st.cu AS DOUBLE)
                     ELSE {scale!r} / CAST(st.hk AS DOUBLE) END) AS inter
      FROM stats st LEFT JOIN sc ON sc.src_a = st.src_a AND sc.src_b = st.src_b
    )
    SELECT e.src_a, e.src_b,
           {hr('greatest(0.0, ea.es - e.inter)', 2)} AS a_not_b_est,
           {hr('greatest(0.0, eb.es - e.inter)', 2)} AS b_not_a_est
    FROM est e
    JOIN srcest ea ON ea.source = e.src_a
    JOIN srcest eb ON eb.source = e.src_b
    """


@register("sketch_kmv_source_difference", oracle=_kmv_diff_oracle())
def sketch_kmv_source_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed cross-source set-difference estimates — "how many of
    corpus A's distinct shingles are NOT in B" for every source pair,
    completing the theta-style set-operation triad next to
    ``sketch_kmv_source_overlap``: |A \\ B| = est|A| - est|A inter B|
    (clamped at 0), every term from the same bounded bottom-k sketches,
    no exact distinct join anywhere. Same broadcast pair-spine doctrine
    and deterministic md5 double math, so the oracle replays every
    estimate bit-exactly."""
    from pyspark.sql import functions as F

    from ..operators import dedup as _dedup

    docs = table(spark, sf_dir, "documents")
    sh = docs.select("source", F.explode(_dedup.shingles("text", 3)).alias("sh"))
    # source DOMAIN from the sketch itself (r15, guide §2.4 — see
    # sketch_kmv_source_overlap): identical source set, and the spine
    # collect reads the lazily checkpointed bounded sketch instead of a
    # second corpus scan; the per-source estimates and pair machinery
    # inside kmv_pairwise_difference reuse the same cut.
    sk = lazy_ckpt(sketches.kmv_sketch(sh, ["source"], F.col("sh"), k=KMV_K))
    srcs = sorted(r.source for r in sk.select("source").distinct().collect())
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]],
        "src_a string, src_b string",
    )
    return sketches.kmv_pairwise_difference(sk, "source", pairs, k=KMV_K)
