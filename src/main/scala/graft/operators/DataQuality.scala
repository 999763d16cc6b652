package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-quality / profiling operators — the audit passes a pipeline
  * runs before trusting a new 100 TB drop: per-column null/distinct
  * profiles, referential-integrity orphan sweeps, and key-skew
  * histograms (the diagnostic that decides whether a join needs
  * salting). All counts are exact integers, so every query is
  * hash-oracle-able.
  */
object DataQuality {

  /** Per-column profile of `customer` in ONE scan: row count, null
    * count, and exact distinct count for every column. The multi-column
    * distinct compiles to a single Expand-based aggregate (one pass,
    * k-way row expansion) — at 100 TB this is the profile shape you
    * want: no per-column rescan, and the result is one row unpivoted to
    * one row per column. For unbounded-cardinality production profiles
    * the distinct would switch to approx_count_distinct; here exactness
    * buys the oracle hash.
    */
  def profile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
          countDistinct(col(c)).as(s"dist_$c"))
      }
    val one = customer(s, d).agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row aggregate into one row per column — driver-free
    // (the explode runs on the single aggregated row)
    val entries = array(cols.map { c =>
      struct(lit(c).as("col_name"), col(s"null_$c").as("n_null"),
        col(s"dist_$c").as("n_distinct"))
    }: _*)
    one.select(col("n_rows"), explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"), col("n_rows"),
        col("e.n_null").as("n_null"), col("e.n_distinct").as("n_distinct"))
  }

  /** Referential-integrity audit across the star schema: for each FK
    * edge, the child row count and the number of orphans (child rows
    * whose key has no parent). One LEFT JOIN + conditional count per
    * edge — the dims broadcast, the fact-to-fact edge
    * (lineitem→orders) shuffles on the key it would join on anyway.
    * Null FK values count as orphans (they reference nothing).
    */
  def integrity(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key).as("k"))
        .join(parent.select(col(pkey).as("k"), lit(1).as("hit")), Seq("k"),
          "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_child"), col("n_orphans"))
    edge("lineitem.l_orderkey", lineitem(s, d), "l_orderkey",
        orders(s, d), "o_orderkey")
      .unionAll(edge("lineitem.l_partkey", lineitem(s, d), "l_partkey",
        part(s, d), "p_partkey"))
      .unionAll(edge("lineitem.l_suppkey", lineitem(s, d), "l_suppkey",
        supplier(s, d), "s_suppkey"))
      .unionAll(edge("orders.o_custkey", orders(s, d), "o_custkey",
        customer(s, d), "c_custkey"))
      .unionAll(edge("customer.c_nationkey", customer(s, d), "c_nationkey",
        nation(s, d), "n_nationkey"))
  }

  /** Join-key skew histogram: group sizes of lineitem by l_partkey,
    * bucketed by floor(log2(size)) — the shape of the decision "does
    * this key need salting / AQE skew handling". The log2 is EXACT
    * integer arithmetic (bit length of the count), never a
    * transcendental whose boundary rounding could differ between
    * engines. Two map-side-combinable aggregations; the second input is
    * one row per distinct key.
    */
  def skew(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("sz"))
      .groupBy((length(bin(col("sz"))) - 1).cast("long").as("log2_sz"))
      .agg(count(lit(1)).as("n_keys"),
        min(col("sz")).as("min_sz"), max(col("sz")).as("max_sz"))

  /** Data-freshness audit: per event stream, volume, newest event
    * time, and its lag behind the newest event anywhere — the
    * staleness check every ingestion monitor alarms on (a source whose
    * lag grows is a dead feed). Exact integer µs; one combinable
    * aggregation plus a 1-row broadcast of the global high-water mark.
    */
  def freshness(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(expr("ts_ns DIV 1000")).as("max_us"))
    val tot = g.agg(max(col("max_us")).as("global_us"))
    g.join(broadcast(tot))
      .select(col("event_type"), col("n"), col("max_us"),
        (col("global_us") - col("max_us")).as("lag_us"))
  }

  /** Observed-metrics telemetry — Spark's `observe()`/`Observation`
    * API: intake invariants (row count, null keys, purchase count,
    * freshness high-water mark) PIGGYBACK on the pipeline's own action
    * as accumulator-style metrics on the scan, so the audit costs ZERO
    * extra passes — at 100 TB the difference between "audited" and
    * "audited by scanning twice". The pipeline action here is the
    * per-type count the CDC monitor actually runs; the returned frame
    * is the observed metric row (bounded, driver-local by design —
    * this op is EAGER: building it runs the one observed action).
    * All four metrics are exact integers, so the DuckDB oracle
    * recomputes them directly.
    */
  def observed(s: SparkSession, d: String): DataFrame = {
    val obs = org.apache.spark.sql.Observation()
    val ev = events(s, d).observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_user"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("n_purchase"),
      max(expr("ts_ns DIV 1000")).as("max_ts_us"))
    // the real action the metrics ride on (its result is the monitor's
    // cheap per-type table; the metrics frame is this op's output)
    ev.groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
    val m = obs.get
    import s.implicits._
    // on an EMPTY events table count is 0 but the sum/max metrics are
    // SQL NULL — surface them as nullable columns (DuckDB's sum/max
    // over zero rows are NULL too, so the oracle row still matches)
    // instead of NPEing on the cast
    def optL(k: String): Option[Long] = Option(m(k)).map(_.asInstanceOf[Long])
    Seq((m("n_rows").asInstanceOf[Long],
      optL("n_null_user"), optL("n_purchase"), optL("max_ts_us")))
      .toDF("n_rows", "n_null_user", "n_purchase", "max_ts_us")
  }

  /** Z-score anomaly audit: per event stream, how many values sit
    * more than 3 standard deviations from the stream mean. Moments
    * come from EXACT decimal sums (one combinable pass), and the flag
    * threshold is the n²-scaled squared form (v·n − Σx)² >
    * 9·(n·Σxx − Σx²) — deterministic double arithmetic over exact
    * sums, no division or sqrt, so the boundary cannot flip between
    * engines. Second pass joins the 1-row-per-type moments broadcast.
    */
  def anomalies(s: SparkSession, d: String): DataFrame = {
    import graft.Tables.dec
    val m = events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sx"),
        sum(dec(col("value")) * dec(col("value"))).as("sxx"))
    events(s, d)
      .join(broadcast(m), "event_type")
      // flag iff (v·n − Σx)² > 9·(n·Σxx − Σx²) — both sides exact
      // decimal-derived doubles, one comparison, no division/sqrt
      .withColumn("dev",
        col("value") * col("n").cast("double") - col("sx").cast("double"))
      .withColumn("is_anomaly",
        col("dev") * col("dev") > lit(9.0) *
          (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_anomalies" -> (anomalies _),
    "q_dq_freshness" -> (freshness _),
    "q_dq_observe" -> (observed _),
    "q_dq_profile" -> (profile _),
    "q_dq_integrity" -> (integrity _),
    "q_dq_skew" -> (skew _),
  )

  val oracles: Map[String, String] = Map(
    "q_dq_anomalies" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(value AS DECIMAL(18,2))
        |      * CAST(value AS DECIMAL(18,2))) AS sxx
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  sum(CASE WHEN (e.value * m.n::DOUBLE - m.sx::DOUBLE)
        |             * (e.value * m.n::DOUBLE - m.sx::DOUBLE)
        |        > 9.0 * (m.n::DOUBLE * m.sxx::DOUBLE
        |                 - m.sx::DOUBLE * m.sx::DOUBLE)
        |      THEN 1 ELSE 0 END)::BIGINT AS n_anomalies
        |FROM events e JOIN m USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q_dq_observe" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_null_user,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_purchase,
        |  max(epoch_ns(ts) // 1000)::BIGINT AS max_ts_us
        |FROM events""".stripMargin,
    "q_dq_freshness" ->
      """WITH g AS (
        |  SELECT event_type, count(*) AS n,
        |    max(epoch_ns(ts) // 1000) AS max_us
        |  FROM events GROUP BY 1)
        |SELECT event_type, n, max_us,
        |  (SELECT max(max_us) FROM g) - max_us AS lag_us
        |FROM g""".stripMargin,
    "q_dq_profile" ->
      """SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(c_custkey) AS n_null,
        |  count(DISTINCT c_custkey) AS n_distinct FROM customer
        |UNION ALL SELECT 'c_name', count(*), count(*) - count(c_name),
        |  count(DISTINCT c_name) FROM customer
        |UNION ALL SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
        |  count(DISTINCT c_nationkey) FROM customer
        |UNION ALL SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
        |  count(DISTINCT c_acctbal) FROM customer
        |UNION ALL SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
        |  count(DISTINCT c_mktsegment) FROM customer""".stripMargin,
    "q_dq_integrity" ->
      """SELECT 'lineitem.l_orderkey' AS fk, count(*) AS n_child,
        |  sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphans
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL SELECT 'lineitem.l_partkey', count(*),
        |  sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |UNION ALL SELECT 'lineitem.l_suppkey', count(*),
        |  sum(CASE WHEN su.s_suppkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |FROM lineitem l LEFT JOIN supplier su ON l.l_suppkey = su.s_suppkey
        |UNION ALL SELECT 'orders.o_custkey', count(*),
        |  sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL SELECT 'customer.c_nationkey', count(*),
        |  sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,
    "q_dq_skew" ->
      """WITH s AS (
        |  SELECT l_partkey, count(*) AS sz FROM lineitem GROUP BY 1)
        |SELECT (length(format('{:b}', sz)) - 1)::BIGINT AS log2_sz,
        |  count(*) AS n_keys, min(sz) AS min_sz, max(sz) AS max_sz
        |FROM s GROUP BY 1""".stripMargin,
  )
}
