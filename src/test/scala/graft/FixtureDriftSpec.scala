package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import graft.streaming.EventStream

/** Fixture-drift tripwire (round-8 post-mortem): the driver regenerated
  * events.parquet with `ts` as TIMESTAMP_MICROS where the old files
  * carried TIMESTAMP(NANOS), and the then-current stream reader
  * force-read the µs values as an ns long — timestamps silently shrank
  * 1000× and three streaming queries shipped wrong answers with every
  * unit test green. These tests read the REAL fixture files through the
  * production readers and assert the decoded event times land inside
  * the fixture's generation window, so the next silent unit/layout
  * change fails a spec instead of a driver correctness row.
  */
class FixtureDriftSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  // any sane fixture generates event times in this era; a 1000× unit
  // slip lands in 1970 (µs read as ns ⇒ ÷1000) or ~56000 AD (ns as µs)
  private val loYear = 2000
  private val hiYear = 2100

  test("batch events reader decodes fixture ts into the generation era") {
    val spark = TestSpark.spark
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    val r = Tables.events(spark, sfDir)
      .agg(year(min(col("ts"))).as("y_min"), year(max(col("ts"))).as("y_max"),
        min(col("ts_ns")).as("ns_min"),
        max(abs(col("ts_ns") - unix_micros(col("ts")) * 1000L)).as("drift"))
      .head()
    assert(r.getInt(0) >= loYear && r.getInt(1) <= hiYear,
      s"decoded years [${r.getInt(0)}, ${r.getInt(1)}] outside fixture era — unit slip")
    // ts and ts_ns must describe the same instant (within the ns the
    // nanos layout keeps below µs resolution)
    assert(r.getLong(3) < 1000L, s"ts vs ts_ns drift ${r.getLong(3)} ns")
    // ns-since-epoch of year 2000 ≈ 9.4e17: a µs-misread value is 1000× off
    assert(r.getLong(2) > 900000000000000000L,
      s"ts_ns ${r.getLong(2)} is not ns-since-epoch magnitude")
  }

  test("stream events reader agrees with the batch reader on the ts range") {
    val spark = TestSpark.spark
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    val name = s"drift_probe_${System.nanoTime()}"
    val q = EventStream.readEvents(spark, sfDir)
      .agg(min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"),
        count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).head()
    val want = Tables.events(spark, sfDir)
      .agg(min(col("ts")), max(col("ts")), count(lit(1))).head()
    assert(got.getTimestamp(0) == want.getTimestamp(0) &&
      got.getTimestamp(1) == want.getTimestamp(1),
      s"stream [${got.getTimestamp(0)}, ${got.getTimestamp(1)}] vs " +
        s"batch [${want.getTimestamp(0)}, ${want.getTimestamp(1)}]")
    assert(got.getLong(2) == want.getLong(2), "stream dropped rows")
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    cal.setTime(got.getTimestamp(1))
    val y = cal.get(java.util.Calendar.YEAR)
    assert(y >= loYear && y <= hiYear, s"stream max(ts) year $y — unit slip")
  }

  test("all three ts layouts decode to the same instants (synthetic)") {
    // the fixtures only ever exhibit ONE layout at a time; this pins
    // the other branches so the next regeneration cannot surprise the
    // readers in either direction. Base instants: two events a minute
    // apart in the 2024 era.
    val spark = TestSpark.spark
    import spark.implicits._
    val us = Seq(1704067200000000L, 1704067260000000L) // 2024-01-01 UTC
    val base = java.nio.file.Files.createTempDirectory("ts_layouts")
    def dirFor(name: String): String = {
      val d = base.resolve(name); d.toFile.mkdirs(); d.toString
    }
    // layout 1: raw ns-since-epoch long (what nanosAsLong yields)
    val dLong = dirFor("as_long")
    us.zipWithIndex.map { case (t, i) =>
      (i.toLong, t * 1000L, i.toLong, "a", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dLong/events.parquet")
    // layout 2: TIMESTAMP_NTZ micros
    val dNtz = dirFor("as_ntz")
    us.zipWithIndex.map { case (t, i) =>
      (i.toLong, java.time.LocalDateTime.ofEpochSecond(
        t / 1000000L, ((t % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC), i.toLong, "a", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dNtz/events.parquet")
    // layout 3: adjusted-to-UTC TimestampType micros
    val dTz = dirFor("as_tz")
    us.zipWithIndex.map { case (t, i) =>
      (i.toLong, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        t / 1000000L, (t % 1000000L) * 1000L)), i.toLong, "a", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dTz/events.parquet")
    val decoded = Seq(dLong, dNtz, dTz).map { d =>
      Tables.events(spark, d)
        .select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("ts_ns"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }
    val want = us.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, t * 1000L) }
    decoded.zip(Seq("long", "ntz", "tz")).foreach { case (got, name) =>
      assert(got == want, s"layout $name decoded $got, want $want")
    }
  }

  test("non-ts fixture schemas carry the columns the operators assume") {
    val spark = TestSpark.spark
    // same convention as the first two tests: a checkout without
    // fixtures skips instead of hard-failing
    assume(new java.io.File(sfDir).exists)
    // cheap footer-only guard: a renamed/retyped column in a
    // regenerated fixture should name itself here, not five operators in
    val want = Map(
      "documents" -> Set("doc_id", "text", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderdate",
        "o_totalprice"))
    want.foreach { case (tbl, cols) =>
      val have = Tables.t(spark, sfDir, tbl).schema.fieldNames.toSet
      val missing = cols -- have
      assert(missing.isEmpty, s"$tbl missing ${missing.mkString(",")}")
    }
  }
}
