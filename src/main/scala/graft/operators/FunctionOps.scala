package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.ConvertF

/** SURVEY §2.7 scalar-function surface exercised over the fixture
  * tables with DuckDB oracles (F1/F2/F3/F5/F8/F9/F12). The same Column
  * functions drive the ETL engine (graft.etl), where they are verified
  * byte-exactly against the reference goldens.
  */
object FunctionOps {

  /** F1 (date+".0"), F2 (number→string), F3 (rstrip-null), F9 (decode),
    * F12 (hex/base64) over orders.
    */
  def fConvert(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      ConvertF.fromDbDate(col("o_orderdate")).as("date_str"),
      ConvertF.fromDbNumber(col("o_totalprice")).as("price_str"),
      ConvertF.fromDbRstrip(col("o_orderpriority")).as("prio"),
      when(col("o_orderstatus") === "F", "final")
        .when(col("o_orderstatus") === "O", "open")
        .when(col("o_orderstatus") === "P", "pending").as("status_decoded"),
      ConvertF.hexEnc(col("o_orderstatus").cast("binary")).as("status_hex"),
      ConvertF.b64Enc(col("o_orderstatus")).as("status_b64"))

  /** F5 — multi-value canonicalization (sort the packed parts). */
  def fMultival(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      ConvertF.multivalFixup(regexp_replace(col("text"), " ", ";"))
        .as("canon"))

  /** F8 — key=value parse with null-on-malformed (events.props JSON-ish
    * field).
    */
  def fParse(s: SparkSession, d: String): DataFrame =
    // regexp_extract yields "" on no-match, and a digits-only value can
    // still overflow LONG — try_cast turns both into NULL (the
    // contract), exactly mirroring the oracle's TRY_CAST
    events(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("_raw"))
      .select(col("event_id"), expr("try_cast(_raw AS LONG)").as("k"))

  /** A10 — exact interpolated percentiles (median/p90) per group. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(min(col("value")), 6).as("vmin"),
        round(max(col("value")), 6).as("vmax"))

  /** A16 — robust dispersion: median absolute deviation of the event
    * value per type (the outlier-resistant spread metric data-quality
    * monitors alarm on; a few corrupt readings move stddev, not MAD).
    * Two exact-percentile aggregations with the per-group median
    * broadcast between them — at scale both keep map-side partials and
    * the 1-row-per-group median join broadcasts.
    */
  def mad(s: SparkSession, d: String): DataFrame = {
    val med = events(s, d).groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    events(s, d)
      .join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(round(expr("percentile(abs(value - med), 0.5)"), 6).as("mad"),
        count(lit(1)).as("n"))
  }

  /** A17 — Pearson correlation from EXACT sufficient statistics: the
    * five sums accumulate in decimal (order-independent), and the
    * correlation is assembled from them in one deterministic double
    * expression. The built-in `corr` streams Welford updates whose
    * float state depends on partition order — fine for exploration,
    * unusable for regression-tested pipelines; this form is the
    * map-side-combinable one a 100 TB feature-correlation pass wants
    * anyway (one pass, five sums, no second scan).
    */
  def corrStats(s: SparkSession, d: String): DataFrame = {
    import graft.Tables.lineitem
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (sqrt(col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            * sqrt(col("n").cast("double") * col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("pearson_r"))
  }

  /** F18 — equi-width bucketize: SQL-standard `width_bucket` over the
    * event values (the numeric feature-binning transform; both engines
    * implement the standard's edge semantics, so bucket ids agree
    * exactly). Bounds are fixed constants — the production form, where
    * the featurizer's bins are frozen at training time.
    */
  def bucketize(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        expr("width_bucket(value, 0.0, 500.0, 20)").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))

  /** A18 — winsorized stream statistics: values clipped to the exact
    * [p5, p95] band before aggregating (the outlier treatment that
    * keeps a corrupted sensor from dragging the mean, without
    * deleting rows like a filter would). Exact percentile bounds per
    * stream broadcast into a clamp; the clipped mean sums in decimal.
    */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    // DISCRETE percentiles (order statistics), not interpolated: the
    // clamp bounds pass through a decimal(18,2) cast in the mean, and
    // cent-quantizing an INTERPOLATED bound amplifies a 1-ulp
    // cross-engine float difference into a 0.01 bound shift whenever
    // the interpolation lands near a half-cent (observed at sf0.001:
    // winsor_mean off by 5e-4 against the oracle). An order statistic
    // is an actual data value — engine-exact at every SF.
    val bounds = events(s, d).groupBy("event_type")
      .agg(expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").as("lo"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").as("hi"))
    events(s, d)
      .join(broadcast(bounds), "event_type")
      .withColumn("v", greatest(least(col("value"), col("hi")), col("lo")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("v"))).cast("double") / count(lit(1)), 6)
          .as("winsor_mean"),
        round(sum(dec(col("value"))).cast("double") / count(lit(1)), 6)
          .as("raw_mean"))
  }

  /** F-string breadth: edit distance, translate, repeat, pad. */
  def stringFns(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        levenshtein(col("event_type"), lit("purchase")).as("lev"),
        translate(col("event_type"), "aeiou", "AEIOU").as("tr"),
        lpad(col("user_id").cast("string"), 6, "0").as("padded"),
        repeat(substring(col("event_type"), 1, 1), 3).as("rep"))

  /** F15 — native JSON extraction (the props column is JSON). */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"))

  /** §2.10 UDAF surface — the bounded top-k Aggregator: top-3 order
    * keys by total price per priority class, with map-side-capped
    * partial state (see TopKIds). The window-rank formulation is the
    * oracle; the aggregate is the one that scales.
    */
  def topkUdaf(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKIds(3))
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top_keys"))
  }

  /** A11 — grouped ordered array aggregation (deterministic: sorted,
    * distinct, joined).
    */
  def groupArrays(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("bucket", pmod(col("user_id"), lit(10)))
      .groupBy("event_type")
      .agg(array_join(array_sort(collect_set(col("bucket"))), ",")
        .as("buckets"))

  /** T5 — relation-level INTERSECT (with T4's EXCEPT this completes the
    * set-op family).
    */
  def intersectKeys(s: SparkSession, d: String): DataFrame = {
    val open = orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey")).distinct()
    val fin = orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey")).distinct()
    open.intersect(fin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_a16_mad" -> (mad _),
    "q_a17_corr" -> (corrStats _),
    "q_f18_bucketize" -> (bucketize _),
    "q_a18_winsorize" -> (winsorize _),
    "q_f_convert" -> (fConvert _),
    "q_f5_multival" -> (fMultival _),
    "q_f8_parse" -> (fParse _),
    "q_a10_percentiles" -> (percentiles _),
    "q_f14_strings" -> (stringFns _),
    "q_f15_json" -> (jsonExtract _),
    "q_f16_topk_udaf" -> (topkUdaf _),
    "q_a11_group_arrays" -> (groupArrays _),
    "q_t5_intersect" -> (intersectKeys _),
  )

  val oracles: Map[String, String] = Map(
    "q_a18_winsorize" ->
      """WITH b AS (
        |  SELECT event_type, quantile_disc(value, 0.05) AS lo,
        |    quantile_disc(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  round(CAST(SUM(CAST(greatest(least(e.value, b.hi), b.lo)
        |      AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS winsor_mean,
        |  round(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 6) AS raw_mean
        |FROM events e JOIN b USING (event_type)
        |GROUP BY 1""".stripMargin,
    // DuckDB has no width_bucket; this is the standard's exact
    // arithmetic for (lo=0, hi=500, n=20): width 25.0 is an exact
    // double, so floor(v/25)+1 matches Spark's computation bit-for-bit
    "q_f18_bucketize" ->
      """SELECT CASE WHEN value < 0.0 THEN 0
        |  WHEN value >= 500.0 THEN 21
        |  ELSE CAST(floor(value / 25.0) + 1 AS BIGINT) END AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_a17_corr" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
        |    6) AS pearson_r
        |FROM s""".stripMargin,
    "q_a16_mad" ->
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |  round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad,
        |  count(*) AS n
        |FROM events e JOIN m USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q_f16_topk_udaf" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderpriority,
        |  string_agg(o_orderkey::VARCHAR, ',' ORDER BY rn) AS top_keys
        |FROM r WHERE rn <= 3 GROUP BY o_orderpriority""".stripMargin,
    "q_f15_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events""".stripMargin,
    "q_a11_group_arrays" ->
      """SELECT event_type,
        |  array_to_string(list_sort(list(DISTINCT user_id % 10)), ',') AS buckets
        |FROM events GROUP BY 1""".stripMargin,
    "q_t5_intersect" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q_a10_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(min(value), 6) AS vmin,
        |  round(max(value), 6) AS vmax
        |FROM events GROUP BY 1""".stripMargin,
    "q_f14_strings" ->
      """SELECT event_id,
        |  levenshtein(event_type, 'purchase') AS lev,
        |  translate(event_type, 'aeiou', 'AEIOU') AS tr,
        |  lpad(user_id::VARCHAR, 6, '0') AS padded,
        |  repeat(substr(event_type, 1, 1), 3) AS rep
        |FROM events""".stripMargin,
    "q_f_convert" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '.0' AS date_str,
        |  CAST(CAST(trunc(o_totalprice) AS BIGINT) AS VARCHAR) AS price_str,
        |  NULLIF(rtrim(o_orderpriority), '') AS prio,
        |  CASE WHEN o_orderstatus = 'F' THEN 'final'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       WHEN o_orderstatus = 'P' THEN 'pending' END AS status_decoded,
        |  lower(hex(o_orderstatus::BLOB)) AS status_hex,
        |  to_base64(o_orderstatus::BLOB) AS status_b64
        |FROM orders""".stripMargin,
    "q_f5_multival" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(str_split(replace(text, ' ', ';'), ';')), ';') AS canon
        |FROM documents""".stripMargin,
    "q_f8_parse" ->
      """SELECT event_id,
        |  TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        |FROM events""".stripMargin,
  )
}
