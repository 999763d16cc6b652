package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Window-shaped operators over the event stream (batch forms; the
  * streaming variants live in graft.streaming): tumbling-window
  * aggregation, gap-based sessionization, last-event-per-key compaction
  * (O5 — the CDC dedup rule), and row-level array set ops (T1–T3).
  */
object Windows {

  /** Tumbling 1-hour windows per event type. */
  def tumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))

  /** Sliding 1-hour windows every 30 minutes (each event lands in two
    * windows) — Spark's `window(ts, dur, slide)` with the epoch-aligned
    * start formula mirrored in the oracle.
    */
  def sliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization (30-min inactivity closes a session):
    * two analytic passes + one aggregation, all shuffle-partitioned by
    * user — the classic scalable formulation.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSess = events(s, d)
      .withColumn("gap_s",
        col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"))
      .withColumn("new_sess",
        when(col("gap_s").isNull || col("gap_s") > 1800.0, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(cum))
    withSess
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("sess_events"))
      .groupBy("user_id")
      .agg(max(col("sess_id")).cast("long").as("n_sessions"),
        sum(col("sess_events")).as("n_events"),
        max(col("sess_events")).as("max_session_events"))
  }

  private val dayUs = 86400000000L
  private val hourUs = 3600000000L

  /** Peak concurrency: the maximum number of user sessions active at
    * any instant of each day — the capacity-planning twin of the
    * sessionization above (sessions = 30-min-gap islands in exact µs
    * integers; a session is active on [first_event, last_event],
    * inclusive, and a midnight-crossing session counts in every day it
    * touches via per-day segments).
    *
    * Sweep-line, but TWO-PHASE so no day needs a global sort: the ±1
    * boundary deltas are summed per instant, swept WITHIN each (day,
    * hour) bucket (running sum + running max, a bucket-local window),
    * then each hour's peak is lifted by the carry — the prefix sum of
    * earlier hours' totals, a 24-row window per day. max(carry +
    * local peak) over hours is exactly the day's global peak, because
    * every prefix of the day's sweep is some hour's carry plus a
    * prefix of that hour. At 100 TB the widest sort this plan runs is
    * one hour of one day's boundaries — the single-window formulation
    * (the spec's reference twin) would sort whole days on one task.
    */
  def concurrency(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("tus"))
      .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(cum))
      .groupBy("user_id", "sess_id")
      .agg(min(col("tus")).as("t0"), max(col("tus")).as("t1"))
    val segs = sess
      .withColumn("day",
        explode(sequence(expr(s"t0 div $dayUs"), expr(s"t1 div $dayUs"))))
      .select(col("day"),
        greatest(col("t0"), col("day") * dayUs).as("a"),
        least(col("t1"), (col("day") + 1) * dayUs - 1).as("b"))
    // inclusive-end sweep: +1 at the segment start, -1 one µs after its
    // end; deltas at one instant collapse first so a back-to-back
    // end/start at the same µs never shows a phantom peak
    val deltas = segs.select(col("day"), col("a").as("t"), lit(1L).as("dl"))
      .unionByName(
        segs.select(col("day"), (col("b") + 1).as("t"), lit(-1L).as("dl")))
      .groupBy("day", "t").agg(sum(col("dl")).as("dl"))
      .withColumn("hour", expr(s"t div $hourUs"))
    val wHour = Window.partitionBy("day", "hour").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourly = deltas
      .withColumn("run", sum(col("dl")).over(wHour))
      .groupBy("day", "hour")
      .agg(max(col("run")).as("hpeak"), sum(col("dl")).as("htot"))
    val wDay = Window.partitionBy("day").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, -1)
    val n = segs.groupBy("day").agg(count(lit(1)).as("n_active"))
    hourly
      .withColumn("carry", coalesce(sum(col("htot")).over(wDay), lit(0L)))
      .groupBy("day")
      .agg(max(col("carry") + col("hpeak")).as("max_concurrent"))
      .join(n, "day")
      .select(col("day"), col("n_active"), col("max_concurrent"))
  }

  /** SCD Type-2 dimension build from the event log: per user, compress
    * consecutive events with the same tracked attribute (event_type)
    * into one version, then stamp each version with its validity
    * interval [valid_from, valid_to) via lead(); the open version has
    * NULL valid_to. Both window passes share the same partitioning and
    * sort, so the plan pays ONE shuffle + ONE sort for the whole build
    * — the shape that makes SCD2 maintenance a single keyed pass at
    * 100 TB. Timestamps are emitted as µs BIGINTs (engine-portable).
    */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val versions = events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    versions
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from_us", expr("ts_ns DIV 1000"))
      .withColumn("valid_to_us", lead(expr("ts_ns DIV 1000"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** O5 — last event per user (CDC "latest state wins" compaction). */
  def lastPerUser(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
  }

  /** T1–T3 — row-level set algebra between adjacent documents' token
    * sets, with an ignore-set subtraction (the reference's attribute
    * diff: ldaptest.py:323–335).
    */
  def arraySetOps(s: SparkSession, d: String): DataFrame = {
    val ignore = Seq("the", "a")
    val base = documents(s, d).select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("t"))
    val a = base.select(col("doc_id").as("doc_a"), col("t").as("ta"))
    val b = base.select(col("doc_id").as("doc_b"), col("t").as("tb"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(col("doc_a"), col("doc_b"),
        array_join(array_sort(array_except(array_except(col("ta"), col("tb")),
          typedLit(ignore))), " ").as("only_a"),
        array_join(array_sort(array_except(array_except(col("tb"), col("ta")),
          typedLit(ignore))), " ").as("only_b"),
        array_join(array_sort(array_except(array_intersect(col("ta"), col("tb")),
          typedLit(ignore))), " ").as("common"))
  }

  /** O6 — analytic-function breadth per user: lag/lead neighbors,
    * row_number, ntile quartile, percent_rank. Ordering is by the raw
    * ns timestamp (tie-free in the data), so both engines rank
    * identically.
    */
  def ranks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns")
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts_ns"))
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .withColumn("next_id", lead(col("event_id"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .drop("ts_ns")
  }

  /** O8 — navigation-function breadth: first/last/nth event and
    * cumulative distribution per user stream, with EXPLICIT rows
    * frames (the default RANGE frame makes last_value mean "current
    * row" — the classic silent-wrong-answer; pinning the frame is the
    * production form and keeps engines agreeing).
    */
  def navigation(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val whole = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts_ns"))
      .withColumn("first_id", first(col("event_id")).over(whole))
      .withColumn("last_id", last(col("event_id")).over(whole))
      .withColumn("second_id", nth_value(col("event_id"), 2).over(whole))
      .withColumn("cd", cume_dist().over(w))
      .drop("ts_ns")
  }

  /** O7 — rolling (bounded rows-frame) aggregate: 3-event moving sum
    * per user — the resampling/smoothing primitive for time-series
    * features. The frame is ROWS-bounded, so execution is a single
    * partitioned sort with an O(frame) running state, never a
    * re-aggregation per row; the sum runs in decimal so partial order
    * cannot perturb the double result.
    */
  def rolling(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns")
      .rowsBetween(-2, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
      .withColumn("roll_sum", sum(dec(col("value"))).over(w).cast("double"))
      .withColumn("n_win", count(lit(1)).over(w))
      .drop("ts_ns", "value")
  }

  /** O10 — time-RANGE frame: trailing 10-minute count and sum per
    * user, keyed on the raw ns timestamp so the frame bound is exact
    * integer arithmetic. A RANGE frame differs from a ROWS frame
    * precisely when event spacing is irregular — this is the
    * rate-limit / trailing-load primitive — and executes as the same
    * single partitioned sort with a sliding frame state: the engine
    * advances two pointers, never re-aggregates per row.
    */
  def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns")
      .rangeBetween(-600000000000L, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
      .withColumn("n_10m", count(lit(1)).over(w))
      .withColumn("sum_10m", sum(dec(col("value"))).over(w).cast("double"))
      .drop("ts_ns", "value")
  }

  /** O11 — running EXACT distinct count without distinct-state: a
    * row is flagged 1 iff it is the first occurrence of its
    * (user, event_type), and the running sum of flags IS the running
    * distinct-type count ("new behaviors discovered over time"). Two
    * window passes, both keyed on bounded partitions — the trick
    * replaces the per-row distinct-set state a naive implementation
    * would carry (unbounded at 100 TB) with a rank test.
    */
  def runningDistinct(s: SparkSession, d: String): DataFrame = {
    val firstW = Window.partitionBy("user_id", "event_type")
      .orderBy("ts_ns", "event_id")
    val cumW = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        col("event_type"))
      .withColumn("flag",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn("n_types", sum(col("flag")).over(cumW))
      .select(col("user_id"), col("event_id"), col("n_types"))
  }

  /** O12 — throttle/debounce: drop an event when the same user
    * emitted the same type within the preceding hour (repeat-noise
    * suppression — the first event of each burst survives; the
    * at-most-one-per-key-per-interval contract rate limiters and
    * notification pipelines enforce). One lag window per (user, type)
    * partition; the stream form is the same predicate under a
    * watermark.
    */
  def debounce(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts_ns", "event_id")
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        col("event_type"))
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .filter(col("prev_ns").isNull ||
        col("ts_ns") - col("prev_ns") >= 3600000000000L)
      .select(col("user_id"), col("event_id"), col("event_type"))
  }

  /** O13 — point-in-time customer features: for each order, the
    * customer's PRIOR order count and prior spend (frame ends one row
    * before current — the leakage guard every feature store enforces:
    * a training row must not see its own outcome). One partitioned
    * sort; spend sums in decimal so the running feature is exact.
    */
  def lifetime(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, -1)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("prior_orders",
        coalesce(count(lit(1)).over(w), lit(0L)))
      .withColumn("prior_spend",
        coalesce(sum(dec(col("o_totalprice"))).over(w),
          lit(0).cast("decimal(18,2)")).cast("double"))
      .select(col("o_orderkey"), col("prior_orders"), col("prior_spend"))
  }

  /** O14 — rolling 7-day active users: each (user, day) activity
    * lands in the 7 trailing daily windows it keeps active, then an
    * exact distinct per window — the WAU/DAU family computed without
    * per-window rescans (explode factor is the window length, the
    * dedup is one shuffle on the window key).
    */
  def rollingActive(s: SparkSession, d: String): DataFrame = {
    val userDays = events(s, d)
      .select(col("user_id"),
        expr("CAST(ts_ns DIV 86400000000000 AS BIGINT)").as("day"))
      .distinct()
    userDays
      .select(col("user_id"),
        explode(expr("sequence(day, day + 6)")).as("win_day"))
      .groupBy("win_day")
      .agg(countDistinct(col("user_id")).as("wau"))
  }

  /** O15 — hour-of-day seasonality profile per stream: volume and
    * decimal-exact mean value by hour bucket — the load-shape summary
    * capacity planning and anomaly baselines read. Hour extraction is
    * pure integer arithmetic on the raw ns timestamp (no session-
    * timezone dependence).
    */
  def seasonality(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"),
        expr("CAST((ts_ns DIV 3600000000000) % 24 AS BIGINT)")
          .as("hour_utc"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("value"))).cast("double") / count(lit(1)), 6)
          .as("mean_value"))

  /** O16 — percent-of-total: each segment's share of global order
    * value via an unpartitioned window over the 5-row aggregate (the
    * window runs over GROUPS, so the "global window" anti-pattern —
    * funneling raw rows through one reducer — never happens; the raw
    * table is reduced map-side first). Shares divide two decimal-exact
    * sums.
    */
  def shareOfTotal(s: SparkSession, d: String): DataFrame = {
    val seg = orders(s, d).groupBy("o_orderpriority")
      .agg(sum(dec(col("o_totalprice"))).as("st"))
    // one double division over two exact decimal sums (deterministic);
    // the window total is computed over the reduced 5-row frame
    seg.withColumn("total", expr("sum(st) OVER ()"))
      .select(col("o_orderpriority"), col("st").cast("double").as("seg_total"),
        round(col("st").cast("double") / col("total").cast("double"), 6)
          .as("share"))
  }

  /** O17 — LOCF gap filling (last observation carried forward): the
    * parsed `props.k` metric is null where absent/malformed; each
    * user's stream imputes nulls from the latest preceding non-null —
    * the standard time-series imputation, as one window pass with
    * ignoreNulls last().
    */
  def locf(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS LONG)")
          .as("k_raw"))
      // deterministic dropout mask (k ≡ 0 mod 7 reads as missing) —
      // the fixture has no real gaps, and an imputation demo that
      // never imputes verifies nothing
      .withColumn("k",
        when(col("k_raw") % 7 === 0, lit(null)).otherwise(col("k_raw")))
      .withColumn("k_filled", last(col("k"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("k"), col("k_filled"))
  }

  /** O18 — burstiness (Fano factor): variance/mean of the per-hour
    * arrival counts per stream — ≈1 for Poisson traffic, ≫1 for bursty
    * (the dispersion test behind anomaly baselining and capacity
    * head-room). Counts are exact integers; the index is assembled as
    * one deterministic double expression over exact sums
    * (n·Σc² − (Σc)²) / (n·Σc), never a streamed float variance.
    * Σc² runs in decimal(38,0) (oracle: HUGEINT) — the int64 square
    * wraps once one stream sustains > 3·10^9 events/hour, and the sum
    * wraps well before that at 100 TB (round-14 width audit); both
    * engines convert the identical exact integer to double at the end.
    */
  def burstiness(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"),
        expr("ts_ns DIV 3600000000000").as("hour_abs"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("sc"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .as("sc2"))
      .select(col("event_type"), col("n_hours"),
        round((col("n_hours").cast("double") * col("sc2").cast("double")
          - col("sc").cast("double") * col("sc").cast("double"))
          / (col("n_hours").cast("double") * col("sc").cast("double")), 6)
          .as("fano"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_w_burstiness" -> (burstiness _),
    "q_w_share" -> (shareOfTotal _),
    "q_w_locf" -> (locf _),
    "q_w_seasonality" -> (seasonality _),
    "q_w_lifetime" -> (lifetime _),
    "q_w_wau" -> (rollingActive _),
    "q_o12_debounce" -> (debounce _),
    "q_w_running_distinct" -> (runningDistinct _),
    "q_w_range_frame" -> (rangeFrame _),
    "q_w_ranks" -> (ranks _),
    "q_w_rolling" -> (rolling _),
    "q_w_tumbling" -> (tumbling _),
    "q_w_sliding" -> (sliding _),
    "q_w_session" -> (sessionize _),
    "q_w_concurrency" -> (concurrency _),
    "q_o5_last_per_user" -> (lastPerUser _),
    "q_etl_scd2" -> (scd2 _),
    "q_w_navigation" -> (navigation _),
    "q_t1_array_setops" -> (arraySetOps _),
  )

  val oracles: Map[String, String] = Map(
    "q_w_burstiness" ->
      """WITH h AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_abs,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, count(*) AS n_hours, sum(c) AS sc,
        |    sum(c::HUGEINT * c) AS sc2
        |  FROM h GROUP BY 1)
        |SELECT event_type, n_hours,
        |  round((n_hours::DOUBLE * sc2::DOUBLE - sc::DOUBLE * sc::DOUBLE)
        |    / (n_hours::DOUBLE * sc::DOUBLE), 6) AS fano
        |FROM s""".stripMargin,
    "q_w_share" ->
      """WITH seg AS (
        |  SELECT o_orderpriority,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS st
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, CAST(st AS DOUBLE) AS seg_total,
        |  round(CAST(st AS DOUBLE)
        |    / CAST(sum(st) OVER () AS DOUBLE), 6) AS share
        |FROM seg""".stripMargin,
    "q_w_locf" ->
      """WITH p0 AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |    TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS kr
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id, tns,
        |    CASE WHEN kr % 7 = 0 THEN NULL ELSE kr END AS k
        |  FROM p0)
        |SELECT user_id, event_id, k,
        |  last_value(k IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS k_filled
        |FROM p""".stripMargin,
    "q_w_seasonality" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 3600000000000) % 24 AS hour_utc,
        |  count(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 6) AS mean_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_w_lifetime" ->
      """SELECT o_orderkey,
        |  COALESCE(count(*) OVER w, 0) AS prior_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w,
        |    0) AS DOUBLE) AS prior_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin,
    "q_w_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events)
        |SELECT win_day, count(DISTINCT user_id) AS wau FROM (
        |  SELECT user_id, unnest(range(day, day + 7)) AS win_day FROM ud)
        |GROUP BY 1""".stripMargin,
    "q_o12_debounce" ->
      """WITH g AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
        |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_ns(ts), event_id) AS prev_ns
        |  FROM events)
        |SELECT user_id, event_id, event_type FROM g
        |WHERE prev_ns IS NULL OR tns - prev_ns >= 3600000000000""".stripMargin,
    "q_w_running_distinct" ->
      """WITH f AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_ns(ts), event_id) = 1 THEN 1 ELSE 0 END AS flag
        |  FROM events)
        |SELECT user_id, event_id,
        |  (sum(flag) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS n_types
        |FROM f""".stripMargin,
    "q_w_range_frame" ->
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_10m,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_10m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
        |             RANGE BETWEEN 600000000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_w_ranks" ->
      """SELECT event_id, user_id,
        |  lag(event_id) OVER w AS prev_id,
        |  lead(event_id) OVER w AS next_id,
        |  row_number() OVER w AS rn,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts))""".stripMargin,
    "q_w_navigation" ->
      """SELECT event_id, user_id,
        |  first_value(event_id) OVER wf AS first_id,
        |  last_value(event_id) OVER wf AS last_id,
        |  nth_value(event_id, 2) OVER wf AS second_id,
        |  cume_dist() OVER w AS cd
        |FROM events
        |WINDOW
        |  w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id),
        |  wf AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q_w_rolling" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
        |  count(*) OVER w AS n_win
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_w_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_w_sliding" ->
      """WITH shifted AS (
        |  SELECT event_type, value,
        |    to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) - sh)
        |      AS w_start_ts, ts
        |  FROM events, (SELECT unnest([0, 1800]) AS sh) shifts)
        |SELECT strftime(w_start_ts, '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM shifted
        |WHERE ts < w_start_ts + INTERVAL 1 HOUR
        |GROUP BY 1, 2""".stripMargin,
    // single-window sweep (fine at oracle scale; Spark runs the
    // two-phase hour-bucketed sweep — same result, pinned by spec)
    "q_w_concurrency" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus,
        |    epoch_ns(ts) // 1000
        |      - lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
        |          ORDER BY epoch_ns(ts) // 1000, event_id) AS gap_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, tus,
        |    SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1
        |        ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM g),
        |sess AS (SELECT user_id, sess_id, min(tus) AS t0, max(tus) AS t1
        |         FROM s GROUP BY 1, 2),
        |segs AS (
        |  SELECT day,
        |    greatest(t0, day * 86400000000) AS a,
        |    least(t1, (day + 1) * 86400000000 - 1) AS b
        |  FROM (SELECT t0, t1,
        |          unnest(range(t0 // 86400000000, t1 // 86400000000 + 1))
        |            AS day
        |        FROM sess) u),
        |deltas AS (
        |  SELECT day, t, SUM(dl) AS dl FROM (
        |    SELECT day, a AS t, 1 AS dl FROM segs
        |    UNION ALL SELECT day, b + 1, -1 FROM segs) x
        |  GROUP BY 1, 2),
        |sweep AS (
        |  SELECT day, SUM(dl) OVER (PARTITION BY day ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS run
        |  FROM deltas),
        |n AS (SELECT day, count(*)::BIGINT AS n_active FROM segs GROUP BY 1)
        |SELECT sweep.day, n.n_active,
        |  max(run)::BIGINT AS max_concurrent
        |FROM sweep JOIN n USING (day)
        |GROUP BY 1, 2""".stripMargin,
    "q_w_session" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id,
        |    SUM(CASE WHEN gap_s IS NULL OR gap_s > 1800.0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM g),
        |per_sess AS (
        |  SELECT user_id, sess_id, count(*) AS sess_events
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, max(sess_id)::BIGINT AS n_sessions,
        |  sum(sess_events)::BIGINT AS n_events,
        |  max(sess_events)::BIGINT AS max_session_events
        |FROM per_sess GROUP BY 1""".stripMargin,
    "q_etl_scd2" ->
      """WITH v AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
        |    epoch_ns(ts) // 1000 AS tus,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS prev_type
        |  FROM events)
        |SELECT user_id,
        |  row_number() OVER w AS version, event_type,
        |  tus AS valid_from_us,
        |  lead(tus) OVER w AS valid_to_us,
        |  lead(tus) OVER w IS NULL AS is_current
        |FROM v
        |WHERE prev_type IS NULL OR prev_type <> event_type
        |-- order by full-ns time (the engine orders by ts_ns): a µs-level
        |-- tie with inverted event_ids would otherwise flip versions
        |WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)""".stripMargin,
    "q_o5_last_per_user" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "q_t1_array_setops" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct(str_split(text, ' ')) AS t FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  COALESCE(array_to_string(list_sort(list_filter(a.t,
        |    x -> NOT list_contains(b.t, x) AND x NOT IN ('the', 'a'))), ' '), '') AS only_a,
        |  COALESCE(array_to_string(list_sort(list_filter(b.t,
        |    x -> NOT list_contains(a.t, x) AND x NOT IN ('the', 'a'))), ' '), '') AS only_b,
        |  COALESCE(array_to_string(list_sort(list_filter(a.t,
        |    x -> list_contains(b.t, x) AND x NOT IN ('the', 'a'))), ' '), '') AS common
        |FROM base a JOIN base b ON b.doc_id = a.doc_id + 1""".stripMargin,
  )
}
