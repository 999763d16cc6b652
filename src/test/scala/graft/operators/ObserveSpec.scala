package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The observe() telemetry op: metrics must equal a direct
  * recomputation, and the op must be re-invocable — an Observation
  * instance is single-use, so a shared/cached one would throw on the
  * second call (Bench runs every query 4×).
  */
class ObserveSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("observed metrics equal a direct recomputation, twice in a row") {
    val s = TestSpark.spark
    val direct = graft.Tables.events(s, dir).agg(
      count(lit(1)), sum(when(col("user_id").isNull, 1L).otherwise(0L)),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)),
      max(expr("ts_ns DIV 1000"))).collect()(0)
    (1 to 2).foreach { i =>
      val row = DataQuality.observed(s, dir).collect()(0)
      assert(row.getLong(0) == direct.getLong(0), s"run $i: n_rows")
      assert(row.getLong(1) == direct.getLong(1), s"run $i: n_null_user")
      assert(row.getLong(2) == direct.getLong(2), s"run $i: n_purchase")
      assert(row.getLong(3) == direct.getLong(3), s"run $i: max_ts_us")
    }
  }
}
