"""Events time-series pack: hierarchical time rollups, batch
sessionization, keep-latest-per-key — the standard event-table ops a
metrics/warehouse layer runs.

Plan notes (100 TB posture):
- time_rollup: GROUPING SETS expands ONE scan into all grains — the
  alternative (a union of three aggregates) scans three times. Shuffle
  key is (grain, bucket, type): time-domain-sized.
- sessionize: one shuffle on user_id; the gap test is lag() inside the
  user partition, the session id a running sum in the same window
  frame chain — two WindowExecs, ONE exchange (same partitioning).
- latest_per_key: row_number desc per user — the dedup-keep-latest
  every CDC/SCD pipeline runs; one exchange on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..operators import panes
from ..functions.rounding import hround
from .registry import register


@register(
    "events_time_rollup",
    oracle="""
    SELECT CAST(grouping(bucket_day) + grouping(event_type) AS INT) AS grain,
           bucket_day, event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS bucket_day, event_type, user_id
      FROM events
    )
    GROUP BY GROUPING SETS ((bucket_day, event_type), (event_type), ())
    ORDER BY grain, bucket_day, event_type
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: daily x type, per-type, and
    grand totals from ONE scan via grouping sets (vs 3 scans as a
    union). count + distinct-user per cell."""
    ev = table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("bucket_day"),
        "event_type",
        "user_id",
    )
    return (
        ev.groupingSets(
            [["bucket_day", "event_type"], ["event_type"], []],
            "bucket_day",
            "event_type",
        )
        .agg(
            (F.grouping("bucket_day") + F.grouping("event_type"))
            .cast("int")
            .alias("grain"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select("grain", "bucket_day", "event_type", "n_events", "n_users")
        .orderBy("grain", "bucket_day", "event_type")
    )


def sessionize(ev: DataFrame, gap_allowed) -> DataFrame:
    """Shared sessionization core: lag -> new-session flag (inactivity
    exceeding ``gap_allowed`` seconds, a Column so the gap may depend on
    the incoming event) -> running-sum session id -> per-session stats.
    The three window steps share ONE user_id exchange (identical
    partitioning). Fixed-gap sessionization is the gap_allowed=constant
    special case — a property test pins that equivalence."""
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; epoch seconds via
    # the (UTC-session) timestamp — DuckDB's date_diff('second',...) twin
    secs = F.col("ts").cast("timestamp").cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = F.when(secs - F.lag(secs).over(w) <= gap_allowed, 0).otherwise(1)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(secs) - F.min(secs)).alias("duration_sec"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "events_sessionize_batch",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) via the shared
    sessionize core; the streaming twin is stream_session_window
    (session_window + watermark)."""
    return sessionize(table(spark, sf_dir, "events"), F.lit(30 * 60))


@register(
    "events_latest_per_user",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key (CDC compaction / upsert-resolve shape):
    row_number desc over the key, keep rn=1. One exchange on user_id;
    at scale this is the dedup step before an SCD2 merge — same shape
    as operators/scd2's in-batch collapse."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
        .orderBy("user_id")
    )


@register(
    "events_type_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b ORDER BY type_a, type_b
    """,
)
def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence matrix (market-basket shape): users who
    performed both types, for every unordered type pair. The self-join
    keys on user_id after a distinct projection — postings are
    (user, type) pairs over a tiny type domain, so the pair expansion is
    bounded by |types|^2 per user, never event x event."""
    ev = table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("type_a", "type_b")
    )


@register(
    "events_sessionize_dynamic_gap",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('second', lag(ts) OVER w, ts)
                       <= CASE WHEN event_type = 'purchase' THEN 3600 ELSE 900 END
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
    FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def events_sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a DYNAMIC inactivity gap — the threshold is an
    expression of the incoming event (purchases hold the session open an
    hour, everything else 15 minutes), the batch twin of
    session_window's dynamic-gap form via the shared sessionize core.
    Same one-exchange shape as the fixed-gap query: the gap expression
    changes, the plan does not."""
    gap_allowed = F.when(F.col("event_type") == "purchase", 3600).otherwise(900)
    return sessionize(table(spark, sf_dir, "events"), gap_allowed)


@register(
    "events_max_concurrency",
    oracle="""
    WITH pts AS (
      SELECT ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT ts + INTERVAL 5 MINUTE, -1 FROM events
    ), swept AS (
      SELECT CAST(t AS DATE) AS day,
             sum(delta) OVER (ORDER BY t, delta ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS live
      FROM pts
    )
    SELECT day, CAST(max(live) AS BIGINT) AS peak_concurrency
    FROM swept GROUP BY day ORDER BY day
    """,
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep-line: each event opens a 5-minute
    presence interval; starts emit +1, ends -1, and the running sum over
    the merged point stream is the live count — max per day. The classic
    interval-stacking shape (concurrent sessions / room occupancy)
    without any interval self-join. Ordering ties break on delta so an
    end and a start at the same instant close before they open (both
    engines sort -1 before +1).

    Scale shape: the sweep is sharded by day — each day's running sum is
    a partitioned window (parallel across shards), and cross-day state
    is carried as a per-day offset (the cumulative sum of each earlier
    day's net delta). The only ordered-unpartitioned window runs over
    the one-row-per-day offset table — metadata scale (365 rows/year),
    never the event stream. Same split pack_training_sequences uses.
    Day is a prefix of the (t, delta) sort key, so per-day local order +
    carried offsets reproduces the global sweep exactly."""
    ev = table(spark, sf_dir, "events")
    t = F.col("ts").cast("timestamp")
    pts = ev.select(t.alias("t"), F.lit(1).alias("delta")).unionAll(
        ev.select((t + F.expr("INTERVAL 5 MINUTES")).alias("t"), F.lit(-1).alias("delta"))
    ).withColumn("day", F.col("t").cast("date"))
    # Per-shard sweep: running sum partitioned by day — fully parallel.
    local_live = F.sum("delta").over(
        W.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    day_stats = (
        pts.withColumn("local_live", local_live)
        .groupBy("day")
        .agg(
            F.max("local_live").alias("local_peak"),
            F.sum("delta").alias("day_net"),
        )
    )
    # Carried boundary offset: intervals still open at each day's start.
    # This window is ordered-unpartitioned but runs over one row per day.
    carried = F.coalesce(
        F.sum("day_net").over(
            W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        day_stats.select(
            "day", (F.col("local_peak") + carried).alias("peak_concurrency")
        )
        .orderBy("day")
    )


@register(
    "events_linear_interpolation",
    oracle="""
    WITH c AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
             count(*) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY hr
    ), spine AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM c),
                                    (SELECT max(hr) FROM c))) AS hr
    ), j AS (
      SELECT spine.hr, c.c FROM spine LEFT JOIN c USING (hr)
    ), f AS (
      SELECT hr, c,
             last_value(c IGNORE NULLS) OVER
               (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN c IS NOT NULL THEN hr END IGNORE NULLS) OVER
               (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             first_value(c IGNORE NULLS) OVER
               (ORDER BY hr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN c IS NOT NULL THEN hr END IGNORE NULLS) OVER
               (ORDER BY hr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM j
    )
    SELECT hr, CAST(c AS BIGINT) AS n_obs,
           (floor((CASE
              WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
              WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN pv + (nv - pv) * (hr - ph) / (nh - ph)
              WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE)
              ELSE CAST(nv AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0) AS filled_r
    FROM f ORDER BY hr
    """,
)
def events_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + LINEAR INTERPOLATION: hourly purchase
    counts on a dense hour spine, silent hours filled by interpolating
    between the nearest observed neighbors (edges carry the last/first
    observation) — the imputation step between gap-fill (zeros,
    events_hourly_gapfill) and forecasting. prev/next observations come
    from last/first IGNORE NULLS frames.

    Scale shape: the only data-sized operation is the count aggregate;
    the spine and every window run over hours-since-epoch — time-domain
    metadata (8.8k rows/year at ANY corpus size), so the unpartitioned
    ordered windows are bounded by the calendar, not the data."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    hr = (F.col("ts").cast("timestamp").cast("long") / F.lit(3600)).cast("long")
    counts = ev.groupBy(hr.alias("hr")).agg(F.count(F.lit(1)).alias("c"))
    spine = counts.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi")).select(
        F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    j = spine.join(F.broadcast(counts), "hr", "left")
    wp = W.orderBy("hr").rowsBetween(W.unboundedPreceding, W.currentRow)
    wn = W.orderBy("hr").rowsBetween(W.currentRow, W.unboundedFollowing)
    obs_hr = F.when(F.col("c").isNotNull(), F.col("hr"))
    f = j.select(
        "hr",
        "c",
        F.last("c", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_hr, ignorenulls=True).over(wp).alias("ph"),
        F.first("c", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_hr, ignorenulls=True).over(wn).alias("nh"),
    )
    filled = (
        F.when(F.col("c").isNotNull(), F.col("c").cast("double"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("hr") - F.col("ph"))
            / (F.col("nh") - F.col("ph")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv").cast("double"))
        .otherwise(F.col("nv").cast("double"))
    )
    return f.select(
        "hr", F.col("c").alias("n_obs"), hround(filled, 6).alias("filled_r")
    ).orderBy("hr")


@register(
    "events_sliding_distinct_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    )
    SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS users_7d
    FROM days d
    JOIN events e
      ON CAST(date_trunc('day', e.ts) AS DATE) BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day — the non-additive rolling
    metric that naively needs a 7x re-scan (the oracle does exactly
    that: a 7-day range self-join). The Spark plan pre-aggregates ONE
    per-day user set (map-side combined collect_set, one shuffle of
    (day, user) pairs) and slides a RANGE window over the DAY-grain
    table — the window input is <= timeline-days rows (metadata scale,
    the same per-day-table discipline as events_max_concurrency), so
    the unpartitioned window never sees event-grain data. At 100 TB
    this is the sketch-free exact variant; agg_hll_sketch_union is the
    mergeable-sketch tier for when even per-day sets are too wide."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.collect_set("user_id").alias("users")
    )
    day_i = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
    w = W.orderBy(day_i).rangeBetween(-6, 0)
    return (
        daily.select(
            "day",
            F.size(F.array_distinct(F.flatten(F.collect_list("users").over(w))))
            .cast("long")
            .alias("users_7d"),
        )
        .orderBy("day")
    )


@register(
    "events_cohort_retention_matrix",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), cohorts AS (
      SELECT user_id, min(day) AS cohort FROM activity GROUP BY user_id
    ), offsets AS (
      SELECT c.cohort, a.user_id, date_diff('day', c.cohort, a.day) AS off
      FROM activity a JOIN cohorts c USING (user_id)
    )
    SELECT cohort,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT user_id) FILTER (off = 1) AS BIGINT) AS d1,
           CAST(count(DISTINCT user_id) FILTER (off = 2) AS BIGINT) AS d2,
           CAST(count(DISTINCT user_id) FILTER (off = 3) AS BIGINT) AS d3,
           CAST(count(DISTINCT user_id) FILTER (off = 7) AS BIGINT) AS d7,
           CAST(count(DISTINCT user_id) FILTER (off = 14) AS BIGINT) AS d14
    FROM offsets GROUP BY cohort ORDER BY cohort
    """,
)
def events_cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, with
    distinct-user counts at day offsets 1/2/3/7/14 — the generalization
    of events_user_retention's single-offset report. One distinct
    activity pass, a per-user min (cohort), and ONE grouped aggregate
    with conditional distinct counts (no pivot shuffle per offset);
    everything shuffles on user/cohort keys only."""
    ev = table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort"))
    off = activity.join(cohorts, "user_id").select(
        "cohort", "user_id", F.datediff("day", "cohort").alias("off")
    )
    conds = {1: "d1", 2: "d2", 3: "d3", 7: "d7", 14: "d14"}
    aggs = [F.countDistinct("user_id").alias("n_users")] + [
        F.countDistinct(F.when(F.col("off") == k, F.col("user_id"))).alias(name)
        for k, name in conds.items()
    ]
    return off.groupBy("cohort").agg(*aggs).orderBy("cohort")


PSI_EDGES = (5.0, 10.0, 20.0, 40.0, 80.0, 160.0)


@register(
    "events_psi_drift",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16'
                  THEN 'ref' ELSE 'cur' END AS half,
             CASE WHEN value <= 5.0 THEN 0 WHEN value <= 10.0 THEN 1
                  WHEN value <= 20.0 THEN 2 WHEN value <= 40.0 THEN 3
                  WHEN value <= 80.0 THEN 4 WHEN value <= 160.0 THEN 5
                  ELSE 6 END AS bucket
      FROM events WHERE value IS NOT NULL
    ), c AS (
      SELECT bucket,
             count(*) FILTER (half = 'ref') AS n_ref,
             count(*) FILTER (half = 'cur') AS n_cur
      FROM b GROUP BY bucket
    ), t AS (
      SELECT sum(n_ref) AS tr, sum(n_cur) AS tc, count(*) AS k FROM c
    )
    SELECT c.bucket,
           CAST(c.n_ref AS BIGINT) AS n_ref,
           CAST(c.n_cur AS BIGINT) AS n_cur,
           (floor((((c.n_ref + 1.0) / (t.tr + t.k)) - ((c.n_cur + 1.0) / (t.tc + t.k)))
                  * ln(((c.n_ref + 1.0) / (t.tr + t.k)) / ((c.n_cur + 1.0) / (t.tc + t.k)))
                  * 1000000.0 + 0.5) / 1000000.0) AS psi_term
    FROM c CROSS JOIN t ORDER BY c.bucket
    """,
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between the first and
    second half of the event timeline — the data-drift monitor a
    production pipeline runs on every metric. Fixed bucket edges keep
    the binning integer-exact across engines; +1 Laplace smoothing makes
    every term defined; per-bucket PSI contributions sum to the headline
    index. One scan, one bucket aggregate, totals broadcast back as a
    1-row cross join (allowlisted aggregate-broadcast pattern)."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    half = F.when(
        F.to_date(F.date_trunc("day", "ts")) < F.lit("2024-01-16").cast("date"),
        F.lit("ref"),
    ).otherwise(F.lit("cur"))
    bucket = F.lit(len(PSI_EDGES))
    for i, e in reversed(list(enumerate(PSI_EDGES))):
        bucket = F.when(F.col("value") <= e, F.lit(i)).otherwise(bucket)
    c = (
        ev.select(half.alias("half"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("half") == "ref", 1)).alias("n_ref"),
            F.count(F.when(F.col("half") == "cur", 1)).alias("n_cur"),
        )
    )
    t = c.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"),
        F.count(F.lit(1)).alias("k"),
    )
    p = (F.col("n_ref") + 1.0) / (F.col("tr") + F.col("k"))
    q = (F.col("n_cur") + 1.0) / (F.col("tc") + F.col("k"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "bucket",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            hround((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), c AS (
      SELECT cur, nxt, count(*) AS n FROM seq WHERE nxt IS NOT NULL
      GROUP BY cur, nxt
    ), t AS (
      SELECT cur, sum(n) AS tot FROM c GROUP BY cur
    )
    SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n,
           (floor((c.n * 1.0 / t.tot) * 1000000.0 + 0.5) / 1000000.0) AS p
    FROM c JOIN t USING (cur) ORDER BY c.cur, c.nxt
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the behavioral model behind next-action prediction and
    anomalous-flow detection. The lead() window partitions by user
    (partition-parallel, ordered by (ts, event_id) for a total
    per-user order); the transition count and row-normalization are two
    tiny aggregates over the |types|^2 cell table."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("cur").agg(F.sum("n").alias("tot"))
    return (
        c.join(t, "cur")
        .select(
            "cur", "nxt", "n",
            hround(F.col("n") * 1.0 / F.col("tot"), 6).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


@register(
    "events_weekday_seasonality",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY day
    ), t AS (SELECT avg(x) AS mu FROM daily)
    SELECT CAST(isodow(day) AS INT) AS iso_weekday,
           CAST(count(*) AS BIGINT) AS n_days,
           (floor(avg(x) * 100.0 + 0.5) / 100.0) AS avg_events,
           (floor((avg(x) / t.mu) * 10000.0 + 0.5) / 10000.0) AS seasonal_index
    FROM daily CROSS JOIN t
    GROUP BY iso_weekday, t.mu ORDER BY iso_weekday
    """,
)
def events_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index of daily activity (avg per ISO weekday
    over the overall daily mean) — calendar semantics pinned across
    engines: Spark's weekday() is 0=Monday, DuckDB's isodow() 1=Monday,
    aligned as weekday+1. Day-grain aggregates only; the overall mean is
    a 1-row aggregate broadcast."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    t = daily.agg(F.avg("x").alias("mu"))
    return (
        daily.crossJoin(F.broadcast(t))
        .groupBy((F.weekday("day") + 1).alias("iso_weekday"), "mu")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            hround(F.avg("x"), 2).alias("avg_events"),
            hround(F.avg("x") / F.first("mu"), 4).alias("seasonal_index"),
        )
        .select("iso_weekday", "n_days", "avg_events", "seasonal_index")
        .orderBy("iso_weekday")
    )


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ), seg AS (
      SELECT user_id, cents, t,
             lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dt
      FROM pts
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           (floor((sum(cents * dt) * 1.0 / (100.0 * sum(dt))) * 1000000.0 + 0.5)
            / 1000000.0) AS twa_value
    FROM seg WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id ORDER BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-WEIGHTED average of the value series (the metric a
    gauge/price stream needs — each reading weighted by how long it was
    current, not how often it was sampled). Integer-exact core: values
    go to BIGINT cents via the shared floor formula and intervals to
    epoch microseconds, so sum(cents * dt) is an exact BIGINT (bounded
    by max_cents * total_range ~ 1.3e17 here, far under 2^63) and the
    single final division is deterministic — no float summation drift.
    One exchange on user_id; lead() runs inside the user partition."""
    e = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pts = e.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),  # ntz -> UTC
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    # event_id tie-break: tied timestamps would otherwise make WHICH
    # reading carries the interval weight partition-order dependent
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    seg = pts.withColumn("dt", F.lead("t").over(w) - F.col("t")).where(
        F.col("dt").isNotNull() & (F.col("dt") > 0)
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            hround(
                F.sum(F.col("cents") * F.col("dt")) * 1.0
                / (100.0 * F.sum("dt")),
                6,
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents,
             count(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY 1
    ), tot AS (
      SELECT sum(cents) * 1.0 / sum(n) AS mu FROM daily
    ), cusum AS (
      SELECT day,
             sum(cents * 1.0 / n - mu) OVER (ORDER BY day) AS s
      FROM daily CROSS JOIN tot
    )
    SELECT best.day AS changepoint_day,
           (floor(abs(best.s) * 1000000.0 + 0.5) / 1000000.0) AS cusum_stat,
           CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days
    FROM (SELECT day, s FROM cusum ORDER BY abs(s) DESC, day ASC LIMIT 1) best
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily mean value series: the
    day maximizing |cumulative deviation from the global mean| — the
    classic single-changepoint location estimator. Day-grain means come
    from exact BIGINT cent sums (deterministic division per day); the
    cumulative sum runs in an ordered window over the ONE-row-per-day
    table (metadata scale, the events_autocorr_lag1 precedent), so both
    engines add the same doubles in the same day order — bit-identical,
    no tolerance. Argmax tie-broken to the earliest day via struct max."""
    e = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = daily.agg((F.sum("cents") * 1.0 / F.sum("n")).alias("mu"))
    cusum = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "s",
            F.sum(F.col("cents") * 1.0 / F.col("n") - F.col("mu")).over(
                W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
            ),
        )
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    best = cusum.agg(
        F.max(
            F.struct(
                F.abs("s").alias("a"),
                (-F.unix_date("day")).alias("nd"),
                F.col("day").alias("day"),
                F.col("s").alias("s"),
            )
        ).alias("b")
    )
    return best.crossJoin(F.broadcast(n_days)).select(
        F.col("b.day").alias("changepoint_day"),
        hround(F.abs("b.s"), 6).alias("cusum_stat"),
        F.col("n_days").cast("long").alias("n_days"),
    )


@register(
    "events_rolling_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS di,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ), win AS (
      SELECT a.day,
             count(*) AS n,
             sum(p.di) AS sd, sum(p.di * p.di) AS sdd,
             sum(p.c) AS sc, sum(p.di * p.c) AS sdc
      FROM daily a JOIN daily p ON p.day BETWEEN a.day - 6 AND a.day
      GROUP BY a.day
    )
    SELECT day, CAST(n AS BIGINT) AS n_days,
           (floor((CAST(n * sdc - sd * sc AS DOUBLE)
                   / CAST(n * sdd - sd * sd AS DOUBLE))
                  * 1000000.0 + 0.5) / 1000000.0) AS slope
    FROM win WHERE n * sdd - sd * sd <> 0
    """,
)
def events_rolling_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day activity trend per day: the OLS slope of daily
    event counts against the day index over each window — computed from
    PANE-ADDITIVE integer regression moments (n, Σd, Σd², Σc, Σdc per
    day, summed across each window's <= 7 panes), so there is no window
    function anywhere and the daily table is scanned once. All moments
    are exact BIGINTs, making the closed-form slope bit-identical in any
    engine (the same no-FP-hazard doctrine as agg_ols_two_features);
    the oracle is the naive 7x self-join. Windows with a single day
    (zero variance) are excluded on both sides."""
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    daily = daily.select(
        "day",
        F.datediff("day", F.lit("2024-01-01").cast("date")).cast("long").alias("di"),
        "c",
    )
    win = panes.sliding_pane_merge(
        daily,
        "day",
        7,
        lambda p: p.groupBy("day7").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("di").alias("sd"),
            F.sum(F.col("di") * F.col("di")).alias("sdd"),
            F.sum("c").alias("sc"),
            F.sum(F.col("di") * F.col("c")).alias("sdc"),
        ),
    )
    det = F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    slope = (F.col("n") * F.col("sdc") - F.col("sd") * F.col("sc")).cast(
        "double"
    ) / det.cast("double")
    return win.where(det != 0).select(
        F.col("day7").alias("day"),
        F.col("n").cast("long").alias("n_days"),
        hround(slope, 6).alias("slope"),
    )


@register(
    "events_sliding_distinct_bitmap",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
      WHERE ts IS NOT NULL
    )
    SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS users_7d
    FROM days d
    JOIN events e
      ON CAST(date_trunc('day', e.ts) AS DATE) BETWEEN d.day - 6 AND d.day
    WHERE e.user_id IS NOT NULL
    GROUP BY d.day
    """,
)
def events_sliding_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, EXACT, from pane-merged
    BITMAPS — the third point on the sliding-distinct spectrum:
    `events_sliding_distinct_users` slides day-grain collect_set's
    (exact, but set width grows with true cardinality),
    `sketch_kmv_sliding_distinct` bounds state at k coins (approximate
    above k); this plan keeps EXACTNESS with BOUNDED MERGEABLE state —
    one <= 4 KB bitmap per (day, 32k-key bucket) built in a single scan
    (map-side combinable), each window OR-merges its <= 7 panes per
    bucket and sums bitmap_count. A hot day's keys spread across its
    buckets, so no task ever holds a day's whole user set, and raw
    events are never re-read per window. The bitmap bytes are
    Spark-internal, but the OUTPUT is an exact count — so the oracle is
    the plain 7x re-scan COUNT(DISTINCT)."""
    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    per_bucket = (
        ev.select(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.bitmap_bucket_number("user_id").alias("bkt"),
            F.bitmap_bit_position("user_id").alias("bit"),
        )
        .groupBy("day", "bkt")
        .agg(F.bitmap_construct_agg(F.col("bit")).alias("bm"))
    )
    return panes.sliding_pane_merge(
        per_bucket,
        "day",
        7,
        lambda p: (
            p.groupBy("day7", "bkt")
            .agg(F.bitmap_count(F.bitmap_or_agg("bm")).alias("c"))
            .groupBy("day7")
            .agg(F.sum("c").alias("users_7d"))
            .select(
                F.col("day7").alias("day"),
                F.col("users_7d").cast("long").alias("users_7d"),
            )
        ),
    )


@register(
    "events_gapfill_locf_interp",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(user_id % 50 AS BIGINT) AS bkt,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS v
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1,2,3
    ), bounds AS (
      SELECT event_type, bkt, min(day) AS lo, max(day) AS hi
      FROM daily GROUP BY 1,2
    ), cal AS (
      SELECT event_type, bkt,
             CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ), dense AS (
      SELECT c.event_type, c.bkt, c.day, d.v
      FROM cal c LEFT JOIN daily d USING (event_type, bkt, day)
    ), filled AS (
      SELECT event_type, bkt, day, v,
        last_value(v IGNORE NULLS) OVER w_prev AS locf,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
            OVER w_prev AS pd,
        first_value(v IGNORE NULLS) OVER w_next AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
            OVER w_next AS nd
      FROM dense
      WINDOW
        w_prev AS (PARTITION BY event_type, bkt ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type, bkt ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bkt, day, v, CAST(locf AS BIGINT) AS locf,
           (floor((CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                   ELSE CAST(locf AS DOUBLE)
                        + (CAST(nv AS DOUBLE) - CAST(locf AS DOUBLE))
                          * (CAST(date_diff('day', pd, day) AS DOUBLE)
                             / CAST(date_diff('day', pd, nd) AS DOUBLE)) END)
                 * 1000000.0 + 0.5) / 1000000.0) AS interp
    FROM filled
    """,
)
def events_gapfill_locf_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill (round 12): densify per-(event_type, user
    bucket) daily activity counts onto each series' own calendar and
    fill the holes with LOCF and linear interpolation — the hypertable
    ``time_bucket_gapfill`` shape. The raw stream is scanned ONCE (the
    daily aggregate); everything after runs at CALENDAR grain (series x
    days — metadata scale at any corpus size), so the per-series windows
    are bounded by the calendar span, never raw cardinality. The 50-way
    user bucketing makes the sf0.01 fixture genuinely gappy (~1.8k gap
    days); counts-in -> the interpolation doubles are bit-stable in both
    engines (same operation order, hround on top)."""
    from ..operators import timeseries

    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        "event_type",
        (F.col("user_id") % 50).cast("long").alias("bkt"),
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("v"))
    out = timeseries.gapfill_daily(daily, ["event_type", "bkt"], "day", "v")
    return out.select(
        "event_type",
        "bkt",
        "day",
        "v",
        F.col("locf").cast("long").alias("locf"),
        hround(F.col("interp"), 6).alias("interp"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), cohort AS (
      SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id
    )
    SELECT c.cohort_wk,
           CAST(date_diff('week', c.cohort_wk, a.wk) AS BIGINT) AS week_k,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-activity week,
    counted distinct in every later week-offset — THE product-analytics
    staple. Scale shape: one distinct projection to (user, week) grain,
    a tiny per-user min (the cohort), one broadcast-joinable cohort
    table IF users are few — here it self-joins on user_id (AQE decides
    the strategy) and aggregates on (cohort, offset): both shuffles are
    keyed by user/cohort, never event-grain. Week arithmetic is integer
    (date_trunc + datediff/7), so the match is exact with no rounding."""
    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_wk",
            (F.datediff("wk", "cohort_wk") / 7).cast("long").alias("week_k"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "events_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
    ), trans AS (
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS c
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), ctx AS (
      SELECT from_type, sum(c) AS n FROM trans GROUP BY 1
    )
    SELECT t.from_type, t.to_type, CAST(t.c AS BIGINT) AS n_trans,
           (floor((CAST(t.c AS DOUBLE) / CAST(x.n AS DOUBLE))
                  * 1000000.0 + 0.5) / 1000000.0) AS p_trans
    FROM trans t JOIN ctx x USING (from_type)
    """,
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: counts and row-normalized probabilities of (type ->
    next type). The lead() runs in a USER-partitioned window (per-user
    event counts are bounded in practice — the classic clickstream
    shape; a pathological single-user stream would be the salting
    case). Downstream state is |types|^2 rows — metadata scale. The
    probability division is a single double op, hround(6) on top."""
    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("c"))
    ctx = trans.groupBy("from_type").agg(F.sum("c").alias("n"))
    return trans.join(ctx, "from_type").select(
        "from_type",
        "to_type",
        F.col("c").cast("long").alias("n_trans"),
        hround(F.col("c").cast("double") / F.col("n").cast("double"), 6).alias(
            "p_trans"
        ),
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS event_type,
             CAST(count(*) AS BIGINT) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
    )
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per user, the
    earliest step-k event STRICTLY AFTER that user's step-(k-1) time —
    the sequential-pattern semantics dashboards mean by 'funnel' (a
    user who purchases before ever viewing does not convert). Each step
    is one filtered min-aggregate on user_id plus a theta-condition
    join against the previous step's (user, ts) table — k passes over
    the (pre-filtered, per-step) events, every shuffle keyed by
    user_id, no per-user window over the full stream and no Python.
    Counts are integers; the oracle is the same step chain in SQL."""
    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    steps = ["view", "click", "purchase"]
    prev = None
    counts = []
    for i, et in enumerate(steps):
        cur = ev.where(F.col("event_type") == et).select("user_id", "ts")
        if prev is not None:
            cur = cur.join(prev, "user_id").where(F.col("ts") > F.col("_t"))
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("_t"))
        counts.append(
            cur.agg(
                F.lit(i + 1).alias("step"),
                F.lit(et).alias("event_type"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
