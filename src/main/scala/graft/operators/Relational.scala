package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operator inventory — SURVEY.md §2.1–§2.6 re-expressed over
  * the TPC-H-ish fixtures, one named query per operator family, each
  * paired with a DuckDB oracle (SparkEntry.oracleSql).
  *
  * Determinism rules used throughout (the driver hash-compares against
  * DuckDB):
  *  - money/value aggregates go through decimal(18,2) so partial-agg
  *    order cannot perturb the sum, then cast back to double;
  *  - every LIMIT sits under a total order (unique tiebreak column);
  *  - nanosecond timestamps (events.ts) are never emitted raw — Spark
  *    truncates parquet ns → µs while DuckDB keeps ns.
  */
object Relational {

  // S1/P1/P2 — full scan with projection + pushed filter.
  def s1ScanProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_partkey") < 50)
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_extendedprice")

  // S2 — range-partitioned chunked scan (key-range predicate).
  def s2RangeScan(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 3000)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  // S3 — filtered event scan with IN-list + LIMIT (work-queue poll).
  def s3EventScan(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isin("error", "purchase"))
      .orderBy("event_id")
      .limit(500)
      .select("event_id", "user_id", "event_type", "value")

  // S4 — time-predicate scan (high-water-mark read).
  def s4TimeScan(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("ts") > lit("2024-01-10 00:00:00").cast("timestamp"))
      .select("event_id", "user_id", "event_type")

  // S5 — point lookup by key.
  def s5PointLookup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_custkey") === 42)
      .select("c_custkey", "c_name", "c_acctbal")

  // S10 — conjunctive + negated predicate subtree search.
  def s10FilterConj(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus") === "F"
        && !col("o_orderpriority").startsWith("1-")
        && col("o_totalprice") > 50000.0)
      .select("o_orderkey", "o_orderpriority")

  // P3 — row validation with error routing (no exceptions; a status
  // column splits valid/invalid in one pass, reference etl.py:615–652).
  def p3Validate(s: SparkSession, d: String): DataFrame = {
    val err = when(!col("event_type").isin("click", "view", "purchase", "signup", "error"),
        "bad_type")
      .when(col("value").isNull || col("value") > 190.0, "value_out_of_range")
      .when(!col("props").startsWith("{"), "bad_props")
    events(s, d)
      .withColumn("error", err)
      .groupBy("error")
      .agg(count(lit(1)).as("n"))
  }

  // J1 — event→user lookup as a set-based left-outer join (reference
  // does one query per row; broadcast the dim side at scale).
  def j1EventUser(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .join(broadcast(customer(s, d)), col("user_id") === col("c_custkey"), "left_outer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))

  // J2 — two-key priority match: primary key join, fallback key join for
  // the misses, coalesced (reference etl.py:945–970 cn-then-uid match).
  def j2PriorityMatch(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).alias("e")
    val c1 = customer(s, d).alias("c1")
    val c2 = customer(s, d).alias("c2")
    e.join(broadcast(c1), col("e.user_id") === col("c1.c_custkey"), "left_outer")
      .join(broadcast(c2),
        (col("e.user_id") % 100) === col("c2.c_custkey") && col("c1.c_custkey").isNull,
        "left_outer")
      .select(col("e.event_id"),
        coalesce(col("c1.c_name"), col("c2.c_name")).as("matched_name"),
        when(col("c1.c_custkey").isNotNull, "primary")
          .when(col("c2.c_custkey").isNotNull, "fallback")
          .otherwise("miss").as("match_kind"))
  }

  // J3 — anti join (snapshot deletion sweep, reference etl.py:900–914).
  def j3Anti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  // J4 — ordered full-tree compare → full outer join of two aggregates
  // on a shared key (reference ldaptest.py:301–351).
  def j4FullOuter(s: SparkSession, d: String): DataFrame = {
    val a = orders(s, d).groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val b = events(s, d).groupBy(col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("n_events"))
    a.join(b, Seq("d"), "full_outer")
      .select(col("d"), col("n_orders"), col("n_events"))
  }

  // J5 — semi join via key list (reference odbc.py:100–115).
  def j5Semi(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")

  // J6 — either-key join (rename queue, reference etl.py:762–781:
  // `benutzername IN (oldcn, newcn)`). A naive OR-join is a nested-loop
  // at scale; the scalable form is a union of two equi-joins, deduped.
  def j6EitherKey(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select("event_id", "user_id")
    val c = customer(s, d).select("c_custkey")
    val m1 = e.join(c, col("c_custkey") === col("user_id"))
    val m2 = e.join(c, col("c_custkey") === (col("user_id") + 50))
    m1.unionByName(m2).distinct()
      .select("event_id", "c_custkey")
  }

  // A1 — duplicate-key detection (reference etl.py:658–664).
  def a1DupDetect(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  // A2 — running high-water mark (reference etl.py:613–614).
  def a2Hwm(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(max("event_id").as("max_id"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("hwm"))

  // A3 — counts per group.
  def a3Counts(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag").agg(count(lit(1)).as("n"))

  // A4 — existence test (any rows pending?), reference testdriver
  // wait_for_sync (testdriver.py:113–121).
  def a4Exists(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .agg((count(when(col("event_type") === "signup", 1)) > 0)
        .as("has_signup"),
        (count(when(col("event_type") === "refund", 1)) > 0)
          .as("has_refund"))

  // A7 — hierarchical subtotals (ROLLUP) with decimal-exact sums.
  def a7Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))

  // A8 — full cross-dimensional subtotals (CUBE).
  def a8Cube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))

  // A9 — skew-safe two-phase aggregation: salt the hot key space,
  // partial-aggregate per (key, salt), then combine per key. Result is
  // identical to the plain groupBy (the oracle is the plain form); at
  // 100 TB this caps any single reducer's input at 1/SALT of the hot
  // key. (AQE skew handling covers joins; salting is the aggregation-
  // side tool.)
  def a9SaltedAgg(s: SparkSession, d: String): DataFrame = {
    val SALT = 16
    events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(SALT)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"),
        sum(dec(col("value"))).as("pv"))
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"),
        sum(col("pv")).cast("double").as("sum_value"))
  }

  // A13 — equi-width histogram: 10 buckets spanning [min, max], edge
  // value folded into the last bucket. The bounds are a 1-row broadcast
  // (no driver round-trip); the bucketing itself is a narrow map +
  // one map-side-combinable count shuffle — the profile-a-column
  // primitive that stays this shape at any corpus size.
  def a13Histogram(s: SparkSession, d: String): DataFrame = {
    val b = lineitem(s, d).agg(
      min(col("l_extendedprice")).as("mn"),
      max(col("l_extendedprice")).as("mx"))
    lineitem(s, d)
      .join(broadcast(b))
      .withColumn("bucket", least(lit(9), floor(
        (col("l_extendedprice") - col("mn")) * 10 / (col("mx") - col("mn"))))
        .cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
  }

  // A5 — distinct key set.
  def a5Distinct(s: SparkSession, d: String): DataFrame =
    orders(s, d).select("o_orderpriority").distinct()

  // A6 — first-N-per-group via window (reference show_col.py:28–33).
  def a6TopNGroup(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  // O2 — case-insensitive stable sort (reference ldaptest.py:135).
  def o2CiSort(s: SparkSession, d: String): DataFrame =
    part(s, d).orderBy(lower(col("p_name")), col("p_partkey"))
      .select("p_partkey", "p_name")

  // O3 — top-k under total order.
  def o3TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_totalprice")

  // T4 — relation-level difference (reference uidmap sweep, EXCEPT).
  def t4Except(s: SparkSession, d: String): DataFrame = {
    val open = orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey")).distinct()
    val fin = orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey")).distinct()
    open.except(fin)
  }

  /** T6/T7 — multiplicity-preserving set ops: EXCEPT ALL subtracts
    * occurrence counts (a customer with 3 open and 1 final order
    * survives twice), INTERSECT ALL keeps the min multiplicity — the
    * bag semantics audit queries need when "how many times" matters.
    * Spark compiles both to a single counted anti/semi aggregation,
    * not a join per duplicate.
    */
  def t6ExceptAll(s: SparkSession, d: String): DataFrame = {
    val open = orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    val fin = orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    open.exceptAll(fin).groupBy("custkey")
      .agg(count(lit(1)).as("multiplicity"))
  }

  def t7IntersectAll(s: SparkSession, d: String): DataFrame = {
    val open = orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    val fin = orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    open.intersectAll(fin).groupBy("custkey")
      .agg(count(lit(1)).as("multiplicity"))
  }

  // Flagship — TPC-H Q1-shaped pricing summary (decimal-exact).
  def q1Pricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("n"))

  /** SQL-frontend surface: the same engine driven through spark.sql
    * over registered views (Catalyst path is identical to the
    * DataFrame API — this query proves the SQL entry point works).
    */
  def sqlFrontend(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem_v
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin)
  }

  /** SQL-frontend breadth: one statement combining a CTE, a dim join,
    * and a window function — the "real analyst query" shape, run
    * through `spark.sql` over registered views with an identical
    * DuckDB text as its oracle (the dialect-portable subset). Proves
    * the SQL entry point handles composed features, not just scans.
    */
  def sqlAnalytics(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_sa")
    customer(s, d).createOrReplaceTempView("customer_sa")
    s.sql(
      """WITH ranked AS (
        |  SELECT c.c_mktsegment, o.o_orderkey,
        |    CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
        |    row_number() OVER (PARTITION BY c.c_mktsegment
        |      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        |  FROM orders_sa o JOIN customer_sa c
        |    ON o.o_custkey = c.c_custkey)
        |SELECT c_mktsegment, o_orderkey, CAST(price AS DOUBLE) AS price, rn
        |FROM ranked WHERE rn <= 5""".stripMargin)
  }

  /** A12 — explicit GROUPING SETS (finer control than rollup/cube):
    * per-(flag,status), per-flag, and grand-total rows in one pass,
    * with grouping() flags disambiguating NULL group keys.
    */
  def sqlGroupingSets(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin)
  }

  /** A14 — PIVOT: per user bucket, one count column per event type.
    * The value list is explicit, so the plan is a single aggregation
    * pass with conditional aggregates (no value-discovery job — at
    * 100 TB an implicit pivot first runs a distinct over the pivot
    * column; the explicit list is the production form).
    */
  def pivotEvents(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, d)
      .withColumn("bucket", pmod(col("user_id"), lit(10)))
      .groupBy("bucket")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      // a pivot cell with no rows surfaces as NULL; the relational
      // meaning (and the oracle's count(CASE ...)) is 0
      .select(col("bucket") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** A15 — UNPIVOT/melt: the lineitem measures as (measure, value)
    * pairs, re-aggregated to exact per-measure totals. Narrow row
    * explosion (no shuffle until the final aggregate), decimal-exact
    * sums.
    */
  def unpivotMeasures(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        col("l_tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "v")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("v"))).cast("double").as("total"))

  /** O9 — Z-order (Morton) clustering key over (l_partkey, l_suppkey):
    * the multi-dimensional layout key that makes min/max data skipping
    * work for BOTH keys at once when the table is written sorted by it
    * (a single-column sort only skips on that column). Pure exact bit
    * interleaving — codegen'd shifts/ors, no UDF. The query reports
    * per-zbucket row counts and morton ranges: contiguous buckets =
    * the file-level clustering a z-ordered write would produce.
    */
  def zorderKey(s: SparkSession, d: String): DataFrame = {
    // 32 bits per key → 64-bit morton: covers keys to 2^32 (a 16-bit
    // interleave would silently alias keys ≥ 65536 at production
    // scale); keys ≥ 2^31 would set the sign bit, where truncating vs
    // flooring division diverges across engines — out of range for any
    // TPC-H-shaped key
    val morton = (0 until 32).map { i =>
      shiftleft(shiftright(col("l_partkey"), i).bitwiseAND(1), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftright(col("l_suppkey"), i).bitwiseAND(1), 2 * i))
    }.reduce(_ bitwiseOR _)
    val z = lineitem(s, d).select(morton.as("morton"))
    // 64 equal-width cells over the OBSERVED morton range (a fixed
    // bit-shift bucketing degenerates to one cell at small key ranges
    // and 2^k cells at large ones; the relative form means the same
    // thing at every scale — cf. the boilerplate threshold)
    val hi = z.agg(max(col("morton")).as("z_top"))
    z.join(broadcast(hi))
      .groupBy(expr("morton * 64 DIV (z_top + 1)").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("morton")).as("z_min"), max(col("morton")).as("z_max"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_a12_grouping_sets" -> (sqlGroupingSets _),
    "q_a14_pivot" -> (pivotEvents _),
    "q_a15_unpivot" -> (unpivotMeasures _),
    "q_o9_zorder" -> (zorderKey _),
    "q_s1_scan_project" -> (s1ScanProject _),
    "q_s2_range_scan" -> (s2RangeScan _),
    "q_s3_event_scan" -> (s3EventScan _),
    "q_s4_time_scan" -> (s4TimeScan _),
    "q_s5_point_lookup" -> (s5PointLookup _),
    "q_s10_filter_conj" -> (s10FilterConj _),
    "q_p3_validate" -> (p3Validate _),
    "q_j1_event_user" -> (j1EventUser _),
    "q_j2_priority_match" -> (j2PriorityMatch _),
    "q_j3_anti" -> (j3Anti _),
    "q_j4_full_outer" -> (j4FullOuter _),
    "q_j5_semi" -> (j5Semi _),
    "q_j6_either_key" -> (j6EitherKey _),
    "q_a1_dup_detect" -> (a1DupDetect _),
    "q_a2_hwm" -> (a2Hwm _),
    "q_a3_counts" -> (a3Counts _),
    "q_a4_exists" -> (a4Exists _),
    "q_a7_rollup" -> (a7Rollup _),
    "q_a9_salted_agg" -> (a9SaltedAgg _),
    "q_a13_histogram" -> (a13Histogram _),
    "q_a8_cube" -> (a8Cube _),
    "q_a5_distinct" -> (a5Distinct _),
    "q_a6_topn_group" -> (a6TopNGroup _),
    "q_o2_ci_sort" -> (o2CiSort _),
    "q_o3_topk" -> (o3TopK _),
    "q_t4_except" -> (t4Except _),
    "q_t6_except_all" -> (t6ExceptAll _),
    "q_t7_intersect_all" -> (t7IntersectAll _),
    "q1_pricing" -> (q1Pricing _),
    "q_sql_frontend" -> (sqlFrontend _),
    "q_sql_analytics" -> (sqlAnalytics _),
  )

  val oracles: Map[String, String] = Map(
    "q_sql_analytics" ->
      """WITH ranked AS (
        |  SELECT c.c_mktsegment, o.o_orderkey,
        |    CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
        |    row_number() OVER (PARTITION BY c.c_mktsegment
        |      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        |  FROM orders o JOIN customer c
        |    ON o.o_custkey = c.c_custkey)
        |SELECT c_mktsegment, o_orderkey, CAST(price AS DOUBLE) AS price, rn
        |FROM ranked WHERE rn <= 5""".stripMargin,
    "q_s1_scan_project" ->
      "SELECT l_orderkey, l_partkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_partkey < 50",
    "q_s2_range_scan" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000",
    "q_s3_event_scan" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE event_type IN ('error','purchase') ORDER BY event_id LIMIT 500",
    "q_s4_time_scan" ->
      "SELECT event_id, user_id, event_type FROM events WHERE ts > TIMESTAMP '2024-01-10 00:00:00'",
    "q_s5_point_lookup" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
    "q_s10_filter_conj" ->
      "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority NOT LIKE '1-%' AND o_totalprice > 50000.0",
    "q_p3_validate" ->
      """SELECT CASE
        |  WHEN event_type NOT IN ('click','view','purchase','signup','error') THEN 'bad_type'
        |  WHEN value IS NULL OR value > 190.0 THEN 'value_out_of_range'
        |  WHEN props NOT LIKE '{%' THEN 'bad_props' END AS error,
        | count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_j1_event_user" ->
      """SELECT c.c_mktsegment, count(*) AS n,
        | CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1""".stripMargin,
    "q_j2_priority_match" ->
      """SELECT e.event_id,
        | COALESCE(c1.c_name, c2.c_name) AS matched_name,
        | CASE WHEN c1.c_custkey IS NOT NULL THEN 'primary'
        |      WHEN c2.c_custkey IS NOT NULL THEN 'fallback'
        |      ELSE 'miss' END AS match_kind
        |FROM events e
        |LEFT JOIN customer c1 ON e.user_id = c1.c_custkey
        |LEFT JOIN customer c2 ON (e.user_id % 100) = c2.c_custkey AND c1.c_custkey IS NULL""".stripMargin,
    "q_j3_anti" ->
      "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "q_j4_full_outer" ->
      """SELECT COALESCE(a.d, b.d) AS d, a.n_orders, b.n_events FROM
        | (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders FROM orders GROUP BY 1) a
        |FULL OUTER JOIN
        | (SELECT CAST(ts AS DATE) AS d, count(*) AS n_events FROM events GROUP BY 1) b
        |USING (d)""".stripMargin,
    "q_j5_semi" ->
      "SELECT p_partkey, p_name FROM part p WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)",
    "q_j6_either_key" ->
      """SELECT DISTINCT e.event_id, c.c_custkey
        |FROM events e JOIN customer c
        |  ON c.c_custkey = e.user_id OR c.c_custkey = e.user_id + 50""".stripMargin,
    "q_a1_dup_detect" ->
      "SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2 HAVING count(*) > 1",
    "q_a2_hwm" ->
      """SELECT event_type, max(event_id) AS max_id,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS hwm
        |FROM events GROUP BY 1""".stripMargin,
    "q_a3_counts" ->
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1",
    "q_a4_exists" ->
      """SELECT count(CASE WHEN event_type = 'signup' THEN 1 END) > 0 AS has_signup,
        | count(CASE WHEN event_type = 'refund' THEN 1 END) > 0 AS has_refund
        |FROM events""".stripMargin,
    "q_a5_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders",
    "q_a9_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q_a13_histogram" ->
      """WITH b AS (SELECT min(l_extendedprice) AS mn,
        |                  max(l_extendedprice) AS mx FROM lineitem)
        |SELECT least(9, floor((l_extendedprice - mn) * 10 / (mx - mn)))::INT
        |    AS bucket,
        |  count(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM lineitem, b
        |GROUP BY 1""".stripMargin,
    "q_a7_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_a8_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_a6_topn_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t WHERE rn <= 3""".stripMargin,
    "q_o2_ci_sort" ->
      "SELECT p_partkey, p_name FROM part ORDER BY lower(p_name), p_partkey",
    "q_o3_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_t4_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q_t6_except_all" ->
      """SELECT custkey, count(*) AS multiplicity FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY 1""".stripMargin,
    "q_t7_intersect_all" ->
      """SELECT custkey, count(*) AS multiplicity FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY 1""".stripMargin,
    "q_sql_frontend" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "q_a12_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin,
    "q_o9_zorder" -> {
      val morton = (0 until 32).map { i =>
        s"(((l_partkey >> $i) & 1) << ${2 * i + 1}) | (((l_suppkey >> $i) & 1) << ${2 * i})"
      }.mkString(" | ")
      s"""WITH z AS (SELECT ($morton) AS morton FROM lineitem),
         |hi AS (SELECT max(morton) AS z_top FROM z)
         |SELECT morton * 64 // (z_top + 1) AS zbucket, count(*) AS n,
         |  min(morton) AS z_min, max(morton) AS z_max
         |FROM z, hi GROUP BY 1""".stripMargin
    },
    "q_a14_pivot" ->
      """SELECT user_id % 10 AS bucket,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q_a15_unpivot" ->
      """SELECT 'l_quantity' AS measure, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem
        |UNION ALL SELECT 'l_discount', count(*),
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |FROM lineitem
        |UNION ALL SELECT 'l_tax', count(*),
        |  CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE)
        |FROM lineitem""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
  )
}
