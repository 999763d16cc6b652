package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import graft.Tables._

/** Join patterns that exist purely for the 100 TB case: key-salting
  * against shuffle skew, and bloom-filter semi-join reduction (ship a
  * ~1 MB sketch instead of shuffling the fact table). Both produce
  * answers identical to the plain formulation — the oracle IS the plain
  * formulation — so the scale machinery is hash-verified, not trusted.
  */
object ScaleJoins {

  private val Salts = 8

  /** Salted fact↔dim join: the classic fix when one join key carries a
    * disproportionate share of the fact rows and a plain shuffle join
    * funnels that key through one reducer. The dim side replicates
    * `Salts` ways (dim × 8 stays tiny), the fact side picks a
    * DETERMINISTIC salt from a row-unique column — content-keyed, so
    * reruns shuffle identically — and the join key becomes (key, salt),
    * spreading each hot key over 8 reducers. `shuffle_hash` hint keeps
    * the demo on the shuffle path (AQE would otherwise broadcast this
    * small dim and hide the pattern being exercised).
    */
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val dim = customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(array((0 until Salts).map(lit): _*)))
    val fact = events(s, d)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(Salts)).cast("int"))
    fact.join(dim.hint("shuffle_hash"),
        fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
  }

  /** Bloom-filter semi-join reduction: build a sketch of the (already
    * filtered, hence small) key side, pre-filter the fact scan with a
    * native `BloomFilterMightContain` — a codegen'd predicate evaluated
    * INSIDE the scan stage, before the shuffle — then run the exact
    * semi join on the survivors. False positives only cost the exact
    * join a few extra rows; the answer is exact. At 100 TB this is the
    * difference between shuffling the whole fact table and shuffling
    * the ~selectivity fraction that can possibly match. The sketch
    * build is one treeAggregate action producing a ~1 MB literal — the
    * same collect-a-sketch shape Spark's own runtime-filter injection
    * and broadcast-hash-join use; no per-row driver work.
    */
  def bloomSemi(s: SparkSession, d: String): DataFrame = {
    val keys = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bf = keys.stat.bloomFilter("o_orderkey", 1L << 20, 0.03)
    val bytes = { val o = new ByteArrayOutputStream(); bf.writeTo(o); o.toByteArray }
    val might = GraftBridge.column(new BloomFilterMightContain(
      GraftBridge.expression(lit(bytes)),
      GraftBridge.expression(col("l_orderkey"))))
    lineitem(s, d)
      .filter(might)
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_j9_salted_join" -> (saltedJoin _),
    "q_j10_bloom_semi" -> (bloomSemi _),
  )

  val oracles: Map[String, String] = Map(
    "q_j9_salted_join" ->
      """SELECT c.c_mktsegment, count(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1""".stripMargin,
    "q_j10_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,
  )
}
