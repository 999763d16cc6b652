package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Cross-check: Spark's built-in gap session_window must agree with the
  * manual lag/cumsum sessionization (Windows.sessionize) on session
  * counts and sizes — two independent formulations of the same
  * semantics. (Boundary note: session_window treats a gap of exactly
  * 30 min as a new session via [start, start+gap); the manual form uses
  * `> 1800 s`. Nanosecond-resolution fixture timestamps make exact-
  * boundary events measure-zero; the suite would catch a drift.)
  */
class SessionWindowSpec extends AnyFunSuite {
  test("session_window agrees with the manual formulation") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val builtin = graft.Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("sess_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_sessions"),
        sum("sess_events").as("n_events"),
        max("sess_events").as("max_session_events"))
    val manual = Windows.sessionize(spark, dir)
    val a = builtin.orderBy("user_id").collect().toSeq
    val b = manual.orderBy("user_id").collect().toSeq
    assert(a == b)
  }
}
