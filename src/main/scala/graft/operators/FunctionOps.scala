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
    events(s, d).select(
      col("event_id"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_f_convert" -> (fConvert _),
    "q_f5_multival" -> (fMultival _),
    "q_f8_parse" -> (fParse _),
  )

  val oracles: Map[String, String] = Map(
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
