package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks as built-ins, expressed in
  * their scale-safe forms:
  *
  *  - **as-of join**: each left row picks the most recent right row of
  *    the same key at an earlier time. Implemented as union +
  *    carry-forward window — ONE shuffle on the key, no per-row lookup,
  *    no range explosion, no broadcast-nested-loop. This is the
  *    canonical distributed as-of: both sides co-partition by key and
  *    the window sort is the same sort a sort-merge join would need.
  *
  *  - **bounded range join**: pair rows whose times fall within a fixed
  *    window of each other. Implemented by bucketing time to the window
  *    width and equi-joining on (key, bucket) with the right side
  *    duplicated into its two covering buckets — turns an inequality
  *    join (quadratic nested-loop at scale) into an equi shuffle with a
  *    residual range filter and a strict 2× duplication bound.
  *
  * Timestamps order by the raw ns-since-epoch long (`ts_ns`) so
  * sub-microsecond ordering matches the source exactly.
  */
object AsofJoin {

  /** Generic as-of: append to `left` the `payload` of the most recent
    * `right` row with equal key and rightTime < leftTime (strict) or
    * <= (non-strict). Right-side ties at one timestamp resolve to the
    * largest payload value, nulls lowest (deterministic). Join-like
    * null semantics: a null key never matches (null-key rights are
    * dropped, null-key lefts get a null payload), and a matched right
    * row whose payload is null yields null — the payload travels in a
    * marker struct so "matched null" and "no match" stay distinct.
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: String, payloadAlias: String,
      strict: Boolean = true): DataFrame = {
    // at equal times, rights sort after lefts in strict mode (excluded
    // by the frame) and before them otherwise (included)
    val rightOrd = if (strict) 2 else 0
    val boxType = new org.apache.spark.sql.types.StructType()
      .add("v", right.schema(payload).dataType)
    val lcols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__ord", lit(1))
      .withColumn("__p", lit(null).cast(boxType))
    val nullLeft = lcols.map(c =>
      lit(null).cast(left.schema(c).dataType).as(c))
    val r = right
      // join semantics: a null key or null time can never match (a null
      // time would sort before every timestamp and fabricate matches)
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(nullLeft ++ Seq(
        col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(rightOrd).as("__ord"),
        struct(col(payload).as("v")).as("__p")): _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__ord"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(payloadAlias,
        last(col("__p"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__ord") === 1)
      .drop("__k", "__t", "__ord", "__p")
  }

  /** J7-ext — attribution as-of: for every event, the id of the user's
    * most recent strictly-earlier purchase event. Times compare at µs
    * (ts_ns div 1000): DuckDB reads the parquet TIMESTAMP(NANOS) column
    * at µs precision, so the oracle can only see µs — an ns-precision
    * compare here would diverge on sub-µs orderings.
    */
  def j7Asof(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"), col("event_type"))
    asof(
      left = ev.drop("event_type"),
      right = ev.filter(col("event_type") === "purchase"),
      leftKey = "user_id", rightKey = "user_id",
      leftTime = "ts_us", rightTime = "ts_us",
      payload = "event_id", payloadAlias = "last_purchase_id")
      .select("event_id", "user_id", "last_purchase_id")
  }

  private val windowUs = 60000000L // 60 s in µs

  /** J8-ext — bounded range join: per event, how many events of the
    * same user happened in the strictly-preceding 60 seconds. Times
    * compare at µs for the same oracle-parity reason as j7Asof.
    */
  def j8Range(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"))
    val l = ev.withColumn("b", expr(s"ts_us div $windowUs"))
    // each right row covers its own bucket and the next one — the 60 s
    // look-back from any left time touches at most those two
    val r = ev.select(col("user_id").as("rk"), col("ts_us").as("rts"))
      .withColumn("b", explode(array(
        expr(s"rts div $windowUs"), expr(s"rts div $windowUs + 1"))))
    l.join(r,
      l("user_id") === r("rk") && l("b") === r("b") &&
        col("rts") >= col("ts_us") - windowUs && col("rts") < col("ts_us"),
      "left_outer")
      .groupBy(col("event_id"))
      .agg(count(col("rts")).as("n_prior_minute"))
  }

  /** J7 through the custom physical operator ([[graft.plans.AsofJoinExec]])
    * instead of the union+window formulation — same rows (shared oracle),
    * one fewer materialized stage: the merge streams both sorted sides.
    */
  def j12AsofExec(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"), col("event_type"))
    graft.plans.AsofExec.asof(
      left = ev.drop("event_type"),
      right = ev.filter(col("event_type") === "purchase"),
      leftKey = "user_id", rightKey = "user_id",
      leftTime = "ts_us", rightTime = "ts_us",
      payload = "event_id", payloadAlias = "last_purchase_id")
      .select("event_id", "user_id", "last_purchase_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_j7_asof" -> (j7Asof _),
    "q_j8_range" -> (j8Range _),
    "q_j12_asof_exec" -> (j12AsofExec _),
  )

  val oracles: Map[String, String] = Map(
    // no (user_id, ts) ties in the data (checked per sf), so arg_max
    // over tp is deterministic
    "q_j7_asof" ->
      """WITH p AS (SELECT user_id, epoch_ns(ts) AS tp, event_id
        |           FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id,
        |  (SELECT arg_max(p.event_id, p.tp) FROM p
        |   WHERE p.user_id = e.user_id AND p.tp < epoch_ns(e.ts))
        |    AS last_purchase_id
        |FROM events e""".stripMargin,
    "q_j8_range" ->
      """SELECT e.event_id, count(r.event_id) AS n_prior_minute
        |FROM events e LEFT JOIN events r
        |  ON r.user_id = e.user_id
        |  AND epoch_ns(r.ts) >= epoch_ns(e.ts) - 60000000000
        |  AND epoch_ns(r.ts) < epoch_ns(e.ts)
        |GROUP BY e.event_id""".stripMargin,
    // identical semantics to q_j7_asof — the custom exec must produce
    // the same relation, so it shares the oracle text verbatim
    "q_j12_asof_exec" ->
      """WITH p AS (SELECT user_id, epoch_ns(ts) AS tp, event_id
        |           FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id,
        |  (SELECT arg_max(p.event_id, p.tp) FROM p
        |   WHERE p.user_id = e.user_id AND p.tp < epoch_ns(e.ts))
        |    AS last_purchase_id
        |FROM events e""".stripMargin,
  )
}
