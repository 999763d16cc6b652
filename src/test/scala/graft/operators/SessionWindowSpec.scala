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

  test("concurrency: two-phase sweep equals a single-window global sweep") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val got = Windows.concurrency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // independent single-window reference over the same session segments
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val D = 86400000000L
    val segs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("tus"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .withColumn("ns",
        when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("ns")).over(cum))
      .groupBy("user_id", "sid")
      .agg(min(col("tus")).as("t0"), max(col("tus")).as("t1"))
      .withColumn("day",
        explode(sequence(expr(s"t0 div $D"), expr(s"t1 div $D"))))
      .select(col("day"), greatest(col("t0"), col("day") * D).as("a"),
        least(col("t1"), (col("day") + 1) * D - 1).as("b"))
    val sweepW = Window.partitionBy("day").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = segs.select(col("day"), col("a").as("t"), lit(1L).as("dl"))
      .unionByName(segs.select(col("day"), (col("b") + 1).as("t"),
        lit(-1L).as("dl")))
      .groupBy("day", "t").agg(sum(col("dl")).as("dl"))
      .withColumn("run", sum(col("dl")).over(sweepW))
      .groupBy("day").agg(max(col("run")).as("mc"))
      .join(segs.groupBy("day").agg(count(lit(1)).as("n")), "day")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
      .sortBy(_._1)
    assert(got.toSeq == ref.toSeq,
      s"two-phase != single-window:\n${got.toSeq}\n${ref.toSeq}")
  }

  test("concurrency: handcrafted overlaps and a midnight-crossing session") {
    val spark = TestSpark.spark
    import spark.implicits._
    val D = 86400000000L
    // user 1: one session [100, 200]; user 2: [150, 300] (overlaps 1);
    // user 3: [250, 320] (overlaps 2 only); peak on day 0 = 2.
    // user 4: crosses midnight [D-50, D+50] — counts on day 0 AND day 1
    // (events 30 s apart stay one session).
    val ev = Seq(
      (1L, 1L, 100L), (2L, 1L, 200L),
      (3L, 2L, 150L), (4L, 2L, 300L),
      (5L, 3L, 250L), (6L, 3L, 320L),
      (7L, 4L, D - 50L), (8L, 4L, D + 50L))
      .toDF("event_id", "user_id", "tus")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(tus)").as("ts"),
        lit("click").as("event_type"), lit(0.0).as("value"),
        lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("conc").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Windows.concurrency(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == ((4L, 2L)),
      s"day 0: 4 active segments, peak 2 (u1+u2 at 150-200, u2+u3 at 250-300): $out")
    assert(out(1L) == ((1L, 1L)), s"day 1: the midnight tail only: $out")
  }
}
