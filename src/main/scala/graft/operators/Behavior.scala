package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Behavioral sequence analytics over the event log — the funnel and
  * cohort-retention queries every product/experiment pipeline runs.
  * Both are exact-integer µs arithmetic end to end.
  */
object Behavior {

  private def tus: Column = expr("ts_ns DIV 1000")

  /** Ordered funnel signup → click → purchase: how many users reach
    * each stage, where each stage must happen STRICTLY after the
    * previous one.
    *
    * The stage times are chained conditional minima — s1 = first
    * signup, s2 = first click with t > s1, s3 = first purchase with
    * t > s2 (the first QUALIFYING event is exactly the minimum
    * qualifying time, since any later qualifying event also
    * qualifies) — computed as three sequential whole-partition window
    * aggregates over ONE user-keyed exchange. Round 14 replaced the
    * previous collect_list + fold form: the fold buffered a user's
    * whole event stream inside a single aggregation row, the same
    * bot-user OOM/skew hazard as the uncapped session paths — but
    * unlike paths, the funnel cannot truncate (a stage may first
    * qualify arbitrarily deep in the stream), so the fix is the
    * spill-safe plan shape, not a cap: WindowExec sorts and SPILLS a
    * pathological user's partition through the external sorter
    * instead of materializing it as one buffer row. The follow-up
    * per-user reduction groups on the window's own partitioning key,
    * so no second exchange (AQE plan: one shuffle total). The
    * three-join SQL formulation (the oracle) expresses the same
    * semantics relationally.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val staged = events(s, d)
      .select(col("user_id"), tus.as("t"), col("event_type"))
      .withColumn("s1",
        min(when(col("event_type") === "signup", col("t"))).over(w))
      .withColumn("s2",
        min(when(col("event_type") === "click" && col("t") > col("s1"),
          col("t"))).over(w))
      .withColumn("s3",
        min(when(col("event_type") === "purchase" && col("t") > col("s2"),
          col("t"))).over(w))
    staged.groupBy("user_id")
      .agg(first(col("s1")).as("s1"), first(col("s2")).as("s2"),
        first(col("s3")).as("s3"))
      .agg(
        sum(when(col("s1").isNotNull, 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("s2").isNotNull, 1L).otherwise(0L)).as("n_click"),
        sum(when(col("s3").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
  }

  /** Cohort retention: users grouped by first-activity week, counted
    * in each subsequent week they were active. Two map-side-combinable
    * aggregations plus one join keyed on user — the cohort table is
    * one row per user (AQE broadcasts it when it fits). Weeks are
    * exact integer division of the µs timestamp.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val ev = events(s, d)
      .select(col("user_id"),
        expr(s"(ts_ns DIV 1000) DIV $weekUs").as("week"))
    val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** First-order transition matrix over the per-user event stream —
    * the Markov-chain summary behind "what do users do next" path
    * analysis and synthetic-session generators. One window pass for
    * the successor (per-user, bounded partitions) and two combinable
    * counts; the conditional probability is integer micro-units (one
    * truncating division), so the matrix is engine-identical.
    */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ns", "event_id")
    val pairs = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val cnt = pairs
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    cnt.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        // staged exact floor of 10^6·n/n_from (the TextAnalysis width
        // discipline): the direct product left only ~9× headroom if
        // the events table is itself the 100 TB table (~10^12 rows);
        // staged, every intermediate is safe to ~9.2·10^15 events
        expr("1000 * ((1000 * n) DIV n_from)" +
          " + (1000 * ((1000 * n) % n_from)) DIV n_from").as("p_micro"))
  }

  /** Top session paths: gap-sessionize (30-min inactivity), render
    * each session's ordered event-type sequence as a path string,
    * count the most common journeys. The per-session ordering is
    * total ((ts, event_id)), so the path strings — and therefore the
    * counts — are deterministic; the path space is in practice
    * vocabulary-bounded, so the final count is a small aggregation and
    * the top-k a TakeOrdered, never a global sort.
    *
    * Paths render from each session's FIRST 64 events (round-14 scale
    * audit): an uncapped collect_list buffers a whole session in one
    * aggregation row, and at 100 TB a bot session with 10^7 events is
    * a several-hundred-MB buffer on one key (OOM + skew) whose exact
    * path tail carries no journey signal anyway. The cap is applied
    * as a row_number filter BEFORE the aggregation — bounding the
    * buffer itself, not just the output — over the same
    * (user, ts, event_id) window the sessionizer already shuffled on
    * (no extra exchange), and the oracle applies the identical rank
    * filter. Human sessions are far below 64 events; the fixture is
    * unaffected.
    */
  def sessionPaths(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ns", "event_id")
    val brk = when(lag(col("ts_ns"), 1).over(w).isNull ||
      col("ts_ns") - lag(col("ts_ns"), 1).over(w) >= 1800000000000L, 1L)
      .otherwise(0L)
    val sess = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        col("event_type"))
      .withColumn("brk", brk)
      .withColumn("sid", sum(col("brk")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sid").orderBy("ts_ns", "event_id")
    sess
      .withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= 64)
      .groupBy("user_id", "sid")
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("ts_ns"), col("event_id"),
          col("event_type")))),
        x => x.getField("event_type"))).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** Revenue attribution: every purchase credits a touchpoint — the
    * user's FIRST non-purchase event ever (first-touch model) and the
    * LAST non-purchase event before the purchase (last-touch model) —
    * the two bookend models every marketing pipeline reports side by
    * side. One user-keyed shuffle: both credits come from the same
    * (user, time) window pass (running first/last over the
    * non-purchase rows), then one small aggregation per model, unioned
    * with a model tag. Purchases with no prior touch credit "(none)".
    * Money is exact decimal(18,2) through the sum (partial-agg order
    * independence), carried as micro-unit DECIMAL(38,0) — a BIGINT
    * micro column wraps (engine) or errors (oracle) past ~$9.2e12 per
    * segment, inside the 100 TB envelope — and EMITTED as its decimal
    * STRING: the driver's cross-engine hash is type-sensitive on wide
    * decimals (pandas holds DECIMAL(38,0) as object on one side,
    * float64 on the other — the round-6 HUGEINT family), so the
    * terminal column is the canonical digit string, exact and
    * hash-identical on both engines.
    */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tus", "event_id")
    val firstW = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val prevW = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val credited = events(s, d)
      .select(col("user_id"), col("event_id"), tus.as("tus"),
        col("event_type"), col("value"))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(firstW))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(prevW))
      .filter(col("event_type") === "purchase")
    def model(name: String, c: Column): DataFrame = credited
      .groupBy(coalesce(c, lit("(none)")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        // decimal(38,0) through the agg, not long: a long
        // revenue_micro wraps (engine, silently under non-ANSI) or
        // errors (oracle) once a touch segment's revenue passes
        // ~$9.2e12 — a 100 TB events table can sum there. v has
        // scale 2, so ×10^6 is integral and the (38,0) cast is
        // exact. The terminal cast to STRING keeps the driver's
        // type-sensitive hash stable (scale-0 decimals render as
        // bare digit strings identically in Spark and DuckDB)
        (sum(dec(col("value"))) * lit(1000000)).cast("decimal(38,0)")
          .cast("string").as("revenue_micro"))
      .withColumn("model", lit(name))
    model("first", col("first_touch"))
      .unionByName(model("last", col("last_touch")))
      .select("model", "touch_type", "n_purchases", "revenue_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_beh_attribution" -> (attribution _),
    "q_beh_paths" -> (sessionPaths _),
    "q_beh_transitions" -> (transitions _),
    "q_beh_funnel" -> (funnel _),
    "q_beh_cohort" -> (cohortRetention _),
  )

  val oracles: Map[String, String] = Map(
    "q_beh_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    first_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |        ORDER BY epoch_ns(ts) // 1000, event_id
        |        ROWS UNBOUNDED PRECEDING) AS first_touch,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |        ORDER BY epoch_ns(ts) // 1000, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM events),
        |p AS (SELECT * FROM t WHERE event_type = 'purchase')
        |SELECT 'first' AS model, coalesce(first_touch, '(none)')
        |    AS touch_type,
        |  count(*) AS n_purchases,
        |  ((sum(v) * 1000000)::DECIMAL(38,0))::VARCHAR AS revenue_micro
        |FROM p GROUP BY 2
        |UNION ALL
        |SELECT 'last', coalesce(last_touch, '(none)'), count(*),
        |  ((sum(v) * 1000000)::DECIMAL(38,0))::VARCHAR
        |FROM p GROUP BY 2""".stripMargin,
    "q_beh_paths" ->
      """WITH g AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
        |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
        |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w
        |              >= 1800000000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |    ORDER BY tns, event_id) AS rn
        |  FROM s),
        |p AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY tns, event_id) AS path
        |  FROM r WHERE rn <= 64 GROUP BY 1, 2)
        |SELECT path, count(*) AS n FROM p
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q_beh_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS to_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |  (1000 * ((1000 * c.n) // t.n_from)
        |    + (1000 * ((1000 * c.n) % t.n_from)) // t.n_from)::BIGINT
        |    AS p_micro
        |FROM c JOIN t USING (from_type)""".stripMargin,
    "q_beh_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_type
        |           FROM events),
        |s1 AS (SELECT user_id, min(tus) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(tus) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND tus > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(tus) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tus > t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_click,
        |       (SELECT count(*) FROM s3) AS n_purchase""".stripMargin,
    "q_beh_cohort" ->
      """WITH e AS (
        |  SELECT user_id,
        |    (epoch_ns(ts) // 1000) // (7 * 86400 * 1000000::BIGINT) AS week
        |  FROM events),
        |c AS (SELECT user_id, min(week) AS cohort FROM e GROUP BY 1)
        |SELECT c.cohort, e.week - c.cohort AS week_offset,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
  )
}
