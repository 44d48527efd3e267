package graft.queries

import graft.Tables
import graft.functions.RSemantics._
import graft.operators.Relational._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** SURVEY.md §2.5 (windows) + §2.6 (sorts/limits/top-k) + P8.
  *
  * Window partitioning notes for scale: every window here partitions on a
  * high-cardinality key (suppkey/custkey/user_id), so state per partition
  * stays small and the sort-within-partition parallelizes. The only global
  * windows (w4 rank, o3 pagination) run on dimension-sized inputs (100
  * suppliers) where a single-partition sort is correct by design.
  */
object WindowQueries {

  /** W1: lag over partition with explicit ordering — the workload's most
    * important operator (13 lag columns, `/root/reference/R/epa_predict.R:241-261`).
    * Year-over-year panel: per (suppkey, year) volume, lagged one season. */
  private val w1LagYoy = Q(
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("l_year", year(col("l_shipdate")).cast(IntegerType))
      // decimal inside the plan (exact, shuffle-order-independent sums);
      // DOUBLE at the output boundary (DECIMAL outputs hash-mismatch the
      // driver's compare on trailing zeros — see RSemantics.sumMoney)
      val panel = li.groupBy("l_suppkey", "l_year")
        .agg(sum(dec2(col("l_quantity"))).as("qty_dec"))
      val w = Window.partitionBy("l_suppkey").orderBy("l_year")
      panel
        .withColumn("prev_dec", lag(col("qty_dec"), 1).over(w))
        .select(
          col("l_suppkey"), col("l_year"),
          col("qty_dec").cast(DoubleType).as("qty"),
          col("prev_dec").cast(DoubleType).as("prev_qty"),
          (col("qty_dec") - col("prev_dec")).cast(DoubleType).as("delta"))
        .orderBy("l_suppkey", "l_year")
    },
    """WITH panel AS (
      |  SELECT l_suppkey, CAST(year(l_shipdate) AS INT) AS l_year,
      |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_suppkey, l_year,
      |  CAST(qty_dec AS DOUBLE) AS qty,
      |  CAST(LAG(qty_dec, 1) OVER w AS DOUBLE) AS prev_qty,
      |  CAST(qty_dec - LAG(qty_dec, 1) OVER w AS DOUBLE) AS delta
      |FROM panel
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_year)
      |ORDER BY l_suppkey, l_year""".stripMargin)

  /** W2: running cumulative sum within partition
    * (`cumsum(under_wp)` `/root/reference/R/wilson_game_pass_freq.R:22-30`).
    * Explicit ROWS frame on both sides — default RANGE frames differ on ties. */
  private val w2RunningSum = Q(
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_total", sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** W2+P8: session cutting by running aggregate — the "game over once WP
    * leaves the band" pattern (`/root/reference/R/wilson_game_pass_freq.R:22-38`):
    * keep each user's events until their first big-value event. */
  private val w2SessionCut = Q(
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("over", sum(when(col("value") > 400, 1).otherwise(0)).over(w))
        .filter(col("over") === 0)
        .select("user_id", "event_id")
        .orderBy("user_id", "event_id")
    },
    """SELECT user_id, event_id FROM (
      |  SELECT user_id, event_id,
      |    SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS over
      |  FROM events) x
      |WHERE over = 0 ORDER BY user_id, event_id""".stripMargin)

  /** W9: batch event-time tumbling window — Structured Streaming's
    * `window()` operator in batch (the expression is identical in either
    * mode): 1-hour tumbling windows per event type. The window start is
    * emitted as epoch SECONDS — timestamp string rendering differs by
    * engine, the epoch integer does not. One shuffle whose key cardinality
    * is (hours × types), map-side combined — bounded however large the
    * event volume grows. */
  private val w9TumblingWindow = Q(
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type"),
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** W9b: SLIDING event-time window (1 h length, 30 min slide) — each
    * event lands in exactly two overlapping windows; Spark expands the
    * membership map-side (an explode, no extra shuffle), then aggregates
    * on the same bounded (start, type) key space. The oracle replays the
    * two epoch-aligned starts per event explicitly: s1 = ⌊t/slide⌋·slide
    * and s0 = s1 − slide, both satisfying s ≤ t < s+length by
    * construction. */
  private val w9bSlidingWindow = Q(
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type"),
    """WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
      |x AS (SELECT event_type, value,
      |        unnest([(us // 1800000000) * 1800 - 1800,
      |                (us // 1800000000) * 1800]) AS win_start
      |      FROM e)
      |SELECT win_start, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** W10: bounded-frame rolling aggregate — a 4-row trailing window
    * (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), the moving-average shape
    * the unbounded frames above don't cover. The frame sum goes through
    * DECIMAL: Spark's sliding-frame evaluator and DuckDB's segment tree
    * add frame members in different orders, so a raw double sum would
    * drift on the low bits — exact decimal is order-independent, and the
    * mean is ONE correctly-rounded double division at the boundary.
    * Scale: partitioned on user_id (high-cardinality), frame state is
    * O(4) per row regardless of partition length. */
  private val w10RollingMean = Q(
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .withColumn("rsum", sum(dec2(col("value"))).over(w))
        .withColumn("rcnt", count(lit(1)).over(w))
        .select(col("user_id"), col("event_id"),
          (col("rsum").cast(DoubleType) / col("rcnt")).as("rolling_mean"))
        .orderBy("user_id", "event_id")
    },
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS rolling_mean
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin)

  /** W8: gap sessionization — a new session wherever a user pauses more
    * than 30 minutes; per-session event count and id span. Two window
    * passes over ONE (user, ts) sort (`Relational.sessionize`); event_id
    * pins the order of equal timestamps. */
  private val w8GapSessions = Q(
    (s, d) => {
      sessionize(Tables.events(s, d), col("user_id"), col("ts"),
          col("event_id"), gapMicros = 30L * 60 * 1000000)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
        .orderBy("user_id", "session_id")
    },
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_id,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** W13: LEAD-based inter-event gaps — time-to-next-event per user (the
    * forward complement of the lag family): gap to the next event in
    * epoch-µs integers (exact), summarized per user. Same partitioned
    * window shape as w1/p8; integer arithmetic end to end except the one
    * mean division. */
  private val w13NextGap = Q(
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("gap_us", lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .groupBy("user_id")
        .agg(count(col("gap_us")).as("n_gaps"),
          sum(col("gap_us")).cast(LongType).as("total_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .filter(col("n_gaps") > 0)
        .select(col("user_id"), col("n_gaps"),
          (col("total_gap_us").cast(DoubleType) / col("n_gaps")).as("mean_gap_us"),
          col("max_gap_us"))
        .orderBy("user_id")
    },
    """WITH g AS (
      |  SELECT user_id,
      |    LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      - epoch_us(ts) AS gap_us
      |  FROM events)
      |SELECT user_id, CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
      |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS mean_gap_us,
      |  MAX(gap_us) AS max_gap_us
      |FROM g GROUP BY 1 HAVING COUNT(gap_us) > 0 ORDER BY 1""".stripMargin)

  /** W15: time-weighted average over IRREGULAR samples — the metric
    * billing/telemetry pipelines actually need (a plain AVG over-weights
    * bursts): step-and-hold (left-Riemann) TWA per (user, event_type)
    * series, Σ value·Δt / span, the last sample carrying zero forward
    * weight; then the per-type mean of the per-series TWAs. Numerics:
    * value snapshots at DECIMAL(18,2) (the money convention) and
    * multiplies EXACTLY by integer µs gaps, so the weighted sum is
    * shuffle-order-independent; the per-series division is one IEEE op of
    * exact inputs, snapshotted at DECIMAL(12,6) before the cross-user
    * mean (w10's bounded-frame lesson applied to weighted sums).
    * Single-sample and zero-span series are excluded deterministically
    * (span > 0). Scale: windows partition on the high-cardinality
    * (user, type) pair — small per-partition state; both aggregates are
    * map-side combinable. */
  private val w15TimeWeightedAvg = Q(
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      val terms = Tables.events(s, d)
        .withColumn("t_us", unix_micros(col("ts")))
        .withColumn("dt_us", lead(col("t_us"), 1).over(w) - col("t_us"))
        .withColumn("term",
          col("value").cast("decimal(18,2)") * coalesce(col("dt_us"), lit(0L)))
      terms.groupBy("user_id", "event_type")
        .agg(sum(col("term")).as("wsum"),
          (max(col("t_us")) - min(col("t_us"))).as("span_us"))
        .filter(col("span_us") > 0)
        .withColumn("twa",
          (col("wsum").cast(DoubleType) / col("span_us")).cast("decimal(12,6)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_series"),
          (sum(col("twa")).cast(DoubleType) / count(lit(1))).as("mean_twa"))
        .orderBy("event_type")
    },
    """WITH t AS (SELECT user_id, event_type, value, epoch_us(ts) AS t_us, event_id
      |  FROM events),
      |g AS (SELECT user_id, event_type, value, t_us,
      |    LEAD(t_us, 1) OVER (PARTITION BY user_id, event_type
      |      ORDER BY t_us, event_id) - t_us AS dt_us
      |  FROM t),
      |p AS (SELECT user_id, event_type,
      |    SUM(CAST(value AS DECIMAL(18,2)) * COALESCE(dt_us, 0)) AS wsum,
      |    MAX(t_us) - MIN(t_us) AS span_us
      |  FROM g GROUP BY 1, 2),
      |u AS (SELECT event_type,
      |    CAST(CAST(wsum AS DOUBLE) / span_us AS DECIMAL(12,6)) AS twa
      |  FROM p WHERE span_us > 0)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_series,
      |  CAST(SUM(twa) AS DOUBLE) / COUNT(*) AS mean_twa
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin)

  /** W11: session funnel — the composition the sessionizer exists for:
    * per 30-minute session, did a click lead to a purchase LATER in the
    * same session? One (user, ts) sort feeds both the sessionizer and the
    * per-session min/max (epoch-µs integers — exact), then one bounded
    * reduce; conversion is a pure integer comparison. Output is the
    * funnel summary a growth dashboard reads. */
  private val w11SessionFunnel = Q(
    (s, d) => {
      val sess = sessionize(Tables.events(s, d), col("user_id"), col("ts"),
        col("event_id"), gapMicros = 30L * 60 * 1000000)
      sess.groupBy("user_id", "session_id")
        .agg(
          min(when(col("event_type") === "click", unix_micros(col("ts")))).as("first_click"),
          max(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("last_purchase"))
        .agg(
          count(lit(1)).as("n_sessions"),
          count(col("first_click")).as("n_with_click"),
          count(col("last_purchase")).as("n_with_purchase"),
          sum(when(col("first_click") < col("last_purchase"), 1).otherwise(0))
            .cast(LongType).as("n_converted"))
    },
    """WITH g AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_type, us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g),
      |p AS (
      |  SELECT user_id, session_id,
      |    MIN(CASE WHEN event_type = 'click' THEN us END) AS first_click,
      |    MAX(CASE WHEN event_type = 'purchase' THEN us END) AS last_purchase
      |  FROM sess GROUP BY 1, 2)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(COUNT(first_click) AS BIGINT) AS n_with_click,
      |  CAST(COUNT(last_purchase) AS BIGINT) AS n_with_purchase,
      |  CAST(SUM(CASE WHEN first_click < last_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
      |FROM p""".stripMargin)

  /** W12: cohort retention — users bucketed by first-seen week (cohort),
    * counted per (cohort week, activity week). Two aggregations over one
    * scan shape: the per-user first-week reduce (map-side combinable),
    * then a distinct-(user, week) activity relation joined back — the
    * join key is the user id (high-cardinality, no broadcast needed
    * either way at scale since both sides are user-keyed aggregates).
    * Weeks are emitted as epoch seconds of the Monday truncation —
    * identical in both engines. */
  private val w12CohortRetention = Q(
    (s, d) => {
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          unix_timestamp(date_trunc("week", col("ts"))).as("wk"))
      val active = wk.distinct()
      val cohort = wk.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      active.join(cohort, Seq("user_id"))
        .groupBy("cohort_wk", "wk")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_wk", "wk")
    },
    """WITH wk AS (SELECT user_id,
      |    CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS wk FROM events),
      |active AS (SELECT DISTINCT user_id, wk FROM wk),
      |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM wk GROUP BY 1)
      |SELECT cohort_wk, wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM active JOIN cohort USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** W3: top-1 per group with explicit deterministic tiebreakers
    * (`arrange %>% slice(1)` `/root/reference/R/nfc_west_starting_qbs.R:25-27`):
    * each customer's latest order. */
  private val w3Top1PerGroup = Q(
    (s, d) => {
      top1PerGroup(
        Tables.orders(s, d),
        Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy("o_custkey")
    },
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
      |FROM (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) x
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)

  /** W4: rank/row index within an ordered set (`mutate(rank = 1:n())`
    * `/root/reference/darko/2_ourlads_projections.R:109-111`). Global window
    * over a dimension-sized input (100 suppliers) — single partition OK. */
  private val w4RankIndex = Q(
    (s, d) => {
      Tables.supplier(s, d)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("s_acctbal").desc, col("s_suppkey").asc)))
        .select("rank", "s_suppkey", "s_name")
        .orderBy("rank")
    },
    """SELECT ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS rank,
      |  s_suppkey, s_name
      |FROM supplier ORDER BY rank""".stripMargin)

  /** W5: percentile-rank normalization within group
    * (`pct_normed = 100*(1+max(rank)-rank)/max(rank)` per position,
    * `/root/reference/darko/2_ourlads_projections.R:106-113`). */
  private val w5PercentRankNorm = Q(
    (s, d) => {
      val wOrd = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
      val wAll = Window.partitionBy("c_mktsegment")
      Tables.customer(s, d)
        .withColumn("rnk", rank().over(wOrd))
        .withColumn("pct_rank", stat4(percent_rank().over(wOrd)))
        .withColumn("pct_normed",
          stat4(lit(100) * (lit(1) + max(col("rnk")).over(wAll) - col("rnk")) / max(col("rnk")).over(wAll)))
        .select("c_custkey", "c_mktsegment", "rnk", "pct_rank", "pct_normed")
        .orderBy("c_custkey")
    },
    """SELECT c_custkey, c_mktsegment,
      |  CAST(rnk AS INT) AS rnk,
      |  ROUND(CAST(pct_rank AS DOUBLE), 4) AS pct_rank,
      |  ROUND(100.0 * (1 + MAX(rnk) OVER (PARTITION BY c_mktsegment) - rnk)
      |        / MAX(rnk) OVER (PARTITION BY c_mktsegment), 4) AS pct_normed
      |FROM (
      |  SELECT c_custkey, c_mktsegment,
      |    RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
      |    PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS pct_rank
      |  FROM customer) x
      |ORDER BY c_custkey""".stripMargin)

  /** W6: group-scoped scalar broadcast (`mutate(tot_n = sum(...))` per group,
    * `/root/reference/R/let_russ_cook.R:26-27`) — share-of-group metric.
    * The group total goes through DECIMAL so the windowed sum is exact and
    * order-independent. */
  private val w6GroupTotal = Q(
    (s, d) => {
      val w = Window.partitionBy("event_type")
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .withColumn("group_total", sum(dec2(col("value"))).over(w).cast(DoubleType))
        .withColumn("share", col("value") / col("group_total"))
        .select("event_id", "event_type", "group_total", "share")
        .orderBy("event_id")
    },
    """SELECT event_id, event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY event_type) AS DOUBLE) AS group_total,
      |  value / CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY event_type) AS DOUBLE) AS share
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)

  /** W7: first/last within ordered group (`dplyr::first/last`,
    * `/root/reference/R/epa_predict.R:181,203-204`). */
  private val w7FirstLast = Q(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("first_date", date_format(first(col("o_orderdate")).over(w), "yyyy-MM-dd"))
        .withColumn("last_date", date_format(last(col("o_orderdate")).over(w), "yyyy-MM-dd"))
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .select("o_custkey", "first_date", "last_date", "first_price")
        .distinct()
        .orderBy("o_custkey")
    },
    """SELECT DISTINCT o_custkey,
      |  strftime(FIRST_VALUE(o_orderdate) OVER w, '%Y-%m-%d') AS first_date,
      |  strftime(LAST_VALUE(o_orderdate) OVER w, '%Y-%m-%d') AS last_date,
      |  FIRST_VALUE(o_totalprice) OVER w AS first_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey""".stripMargin)

  /** P8: filter on a window-derived value (`filter(posteam != lag_posteam)`
    * `/root/reference/R/epa_predict.R:432-435`): orders where the priority
    * changed vs the customer's previous order. Null-lag rows drop via
    * three-valued logic — exactly the reference's `!=` semantics. */
  private val p8WindowFilter = Q(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .withColumn("prev_priority", lag(col("o_orderpriority"), 1).over(w))
        .filter(col("o_orderpriority") =!= col("prev_priority"))
        .select("o_custkey", "o_orderkey", "o_orderpriority", "prev_priority")
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey, o_orderpriority, prev_priority FROM (
      |  SELECT o_custkey, o_orderkey, o_orderpriority,
      |    LAG(o_orderpriority, 1) OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_priority
      |  FROM orders) x
      |WHERE o_orderpriority <> prev_priority
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** O3: pagination by rank slice (`slice(17:32)`
    * `/root/reference/darko/2_ourlads_projections.R:261-266`). */
  private val o3Pagination = Q(
    (s, d) => {
      Tables.supplier(s, d)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("s_acctbal").desc, col("s_suppkey").asc)))
        .filter(col("rank").between(17, 32))
        .select("rank", "s_name", "s_acctbal")
        .orderBy("rank")
    },
    """SELECT rank, s_name, s_acctbal FROM (
      |  SELECT s_name, s_acctbal,
      |    ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS rank
      |  FROM supplier) x
      |WHERE rank BETWEEN 17 AND 32 ORDER BY rank""".stripMargin)

  /** W14: exponentially-weighted moving average over a bounded lookback —
    * the smoothing primitive behind drift monitors and rate limiters.
    * Two deliberate choices make it BIT-EXACT across engines (no decimal
    * machinery needed): (1) decay α = 1/2, so every weight 2⁻ⁱ is a power
    * of two and each product value·2⁻ⁱ is an EXACT double scaling;
    * (2) the 8-term numerator/denominator are assembled from lag() values
    * in pinned left-to-right order, so both engines add the same doubles
    * in the same sequence, and the final normalize is one IEEE division.
    * (A frame-SUM would NOT be stable — DuckDB evaluates bounded frames
    * with segment trees, Spark re-adds in frame order.) The window
    * partitions by user_id — bounded state, parallel sort. Head-of-series
    * rows normalize over the weights actually present. */
  private val w14Ewma = Q(
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val lags = (1 to 7).map(i => lag(col("value"), i).over(w))
      val terms = col("value") +: lags
      val weights = (0 to 7).map(i => math.pow(0.5, i))
      val num = terms.zip(weights)
        .map { case (t, wt) => when(t.isNull, 0.0).otherwise(t * wt) }
        .reduce(_ + _)
      val den = terms.zip(weights)
        .map { case (t, wt) => when(t.isNull, 0.0).otherwise(lit(wt)) }
        .reduce(_ + _)
      Tables.events(s, d)
        .filter(col("user_id") < 200)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("ewma8", num / den)
        .orderBy("event_id")
    },
    {
      val numSql = (0 to 7).map { i =>
        val t = if (i == 0) "value" else s"lag(value, $i) OVER w"
        s"CASE WHEN $t IS NULL THEN 0.0 ELSE $t * CAST(${math.pow(0.5, i)} AS DOUBLE) END"
      }.mkString(" + ")
      val denSql = (0 to 7).map { i =>
        val t = if (i == 0) "value" else s"lag(value, $i) OVER w"
        s"CASE WHEN $t IS NULL THEN 0.0 ELSE CAST(${math.pow(0.5, i)} AS DOUBLE) END"
      }.mkString(" + ")
      s"""SELECT event_id, user_id, value,
         |  ($numSql) / ($denSql) AS ewma8
         |FROM events WHERE user_id < 200
         |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         |ORDER BY event_id""".stripMargin
    })

  val all: Map[String, Q] = Map(
    "w1_lag_yoy" -> w1LagYoy,
    "w2_running_sum" -> w2RunningSum,
    "w2_session_cut" -> w2SessionCut,
    "w8_gap_sessions" -> w8GapSessions,
    "w9_tumbling_window" -> w9TumblingWindow,
    "w9b_sliding_window" -> w9bSlidingWindow,
    "w10_rolling_mean" -> w10RollingMean,
    "w11_session_funnel" -> w11SessionFunnel,
    "w13_next_gap" -> w13NextGap,
    "w14_ewma" -> w14Ewma,
    "w15_time_weighted_avg" -> w15TimeWeightedAvg,
    "w12_cohort_retention" -> w12CohortRetention,
    "w3_top1_per_group" -> w3Top1PerGroup,
    "w4_rank_index" -> w4RankIndex,
    "w5_percent_rank_norm" -> w5PercentRankNorm,
    "w6_group_total" -> w6GroupTotal,
    "w7_first_last" -> w7FirstLast,
    "p8_window_filter" -> p8WindowFilter,
    "o3_pagination" -> o3Pagination)
}
