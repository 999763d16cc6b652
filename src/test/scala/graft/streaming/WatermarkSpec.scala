package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Watermark semantics: events arriving after the watermark has passed
  * their window are dropped — bounded state is what makes event-time
  * aggregation viable on an unbounded 100 TB stream.
  */
class WatermarkSpec extends AnyFunSuite {
  private def ns(t: String): Long =
    java.sql.Timestamp.valueOf(t).getTime * 1000000L

  private def writeBatch(dir: String, name: String, rows: Seq[Row]): Unit = {
    // the file stream source only sees flat files: stage the write,
    // then move the part file into the watched dir
    val spark = TestSpark.spark
    val stage = java.nio.file.Files.createTempDirectory("graft-wm-stage")
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), EventStream.rawSchema)
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = java.nio.file.Files.list(stage).iterator().asScala
      .asInstanceOf[Iterator[java.nio.file.Path]]
      .filter(_.getFileName.toString.endsWith(".parquet")).next()
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
  }
  private implicit class IterAsScala(it: java.util.Iterator[java.nio.file.Path]) {
    def asScala: Iterator[java.nio.file.Path] = new Iterator[java.nio.file.Path] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }
  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A]()
      s.foreach(l.add); l
    }
  }

  test("late events beyond the watermark are dropped from closed windows") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-wm").toString
    val ev = (id: Long, t: String) =>
      Row(id, ns(t), 1L, "click", 1.0, "{}")

    // batch 1: three events in the 10:00 window + one at 12:00 that
    // pushes the watermark to 11:50 (> 11:00 window end)
    writeBatch(dir, "b1", Seq(
      ev(1, "2024-01-01 10:00:10"), ev(2, "2024-01-01 10:20:00"),
      ev(3, "2024-01-01 10:59:59"), ev(4, "2024-01-01 12:00:00")))

    val stream = spark.readStream
      .schema(EventStream.rawSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val agg = EventStream.tumblingCounts(
      stream.drop("ts_ns"))
    val name = s"wm_test_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()

    // batch 2: a late straggler for the (closed) 10:00 window, plus a
    // 14:00 event that advances the watermark far enough to flush all
    writeBatch(dir, "b2", Seq(
      ev(5, "2024-01-01 10:30:00"), // LATE — must be dropped
      ev(6, "2024-01-01 14:00:00")))
    q.processAllAvailable(); q.stop()

    val out = spark.table(name)
      .select("hour", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("2024-01-01 10:00:00") == 3L,
      s"late event must not count: $out")
    assert(out("2024-01-01 12:00:00") == 1L)
  }
}
