package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated TPC-H-ish parquet fixtures
  * (TESTDATA.md). One parquet file per table under the sf dir.
  *
  * All access goes through here so that scan-level concerns (schema
  * pruning, predicate pushdown) are observable in one place; at 100 TB
  * these would be partitioned/bucketed table reads, the call sites do
  * not change.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default ([PARQUET_TYPE_ILLEGAL]). Read it as a long (ns since
    * epoch) and convert to a µs TimestampType column; `ts_ns` keeps the
    * raw value for pushdown-friendly range predicates.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Explicit fan-out width for pre-explode repartitions. AQE sizes
    * exchanges off the tiny pre-explode rows and would coalesce a wide
    * stage right back to a handful of tasks, so explode-heavy operators
    * pin an explicit partition count — but that count must track the
    * cluster, not a literal. Resolution order: `graft.fanout.partitions`
    * conf (explicit override) → `spark.sql.shuffle.partitions` →
    * `defaultParallelism`. On local[32] this lands on 32 as before; on a
    * 1000-executor cluster it follows the session's shuffle sizing.
    */
  def fanout(s: SparkSession): Int =
    s.conf.getOption("graft.fanout.partitions")
      .orElse(s.conf.getOption("spark.sql.shuffle.partitions"))
      .map(_.toInt)
      .filter(_ > 0)
      .getOrElse(s.sparkContext.defaultParallelism)

  /** Exact-sum money column: double → decimal(18,2) so partial-agg order
    * cannot perturb the result (needed for bit-exact DuckDB oracle
    * hashes; also the right call at 100 TB where a double sum over 1e12
    * rows drifts).
    */
  def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,2)")
}
