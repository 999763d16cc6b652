package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import graft.tools.JsonlTools

/** The JSONL source's load-bearing property is the P3 discipline
  * applied to a source: malformed lines are ROUTED to the corrupt
  * column, never thrown, and never damage the well-formed rows around
  * them. Type enforcement must also hold — a quoted doc_id is a
  * corrupt ROW under the explicit schema, not a silent string column
  * (the inferSchema drift this source exists to prevent).
  */
class JsonlSourceSpec extends AnyFunSuite {

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec")
    java.nio.file.Files.write(dir.resolve("part-00000.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("malformed lines route to _corrupt_record; good rows survive") {
    val spark = TestSpark.spark
    val dir = writeLines(Seq(
      """{"doc_id":1,"text":"hello world","lang":"en","source":"web","n_chars":11}""",
      """not json at all""",
      """{"doc_id":2,"text":"zwei","lang":"de","source":"web","n_chars":4}""",
      """{"doc_id":3,"text":"broken""",
      """{"doc_id":4,"text":null,"lang":"fr","source":"books","n_chars":0}"""))
    // collect once: Spark (correctly) refuses scans whose referenced
    // columns are ONLY the internal corrupt column, so assertions run
    // on the materialized rows
    val rows = JsonlTools.readJsonl(spark, dir).collect()
    val good = rows.filter(_.isNullAt(5))
    val bad = rows.filterNot(_.isNullAt(5))
    assert(good.length == 3)
    // quarantined lines carry the raw text for replay/debugging
    assert(bad.map(_.getString(5)).toSet ==
      Set("not json at all", """{"doc_id":3,"text":"broken"""))
    // well-formed rows are intact, including the explicit null text
    assert(good.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    assert(good.count(r => r.getLong(0) == 4L && r.isNullAt(1)) == 1)
  }

  test("type drift is a corrupt row, not a silent string column") {
    val spark = TestSpark.spark
    val dir = writeLines(Seq(
      """{"doc_id":"abc","text":"quoted id","lang":"en","source":"web","n_chars":9}""",
      """{"doc_id":7,"text":"fine","lang":"en","source":"web","n_chars":4}"""))
    val df = JsonlTools.readJsonl(spark, dir)
    assert(df.schema("doc_id").dataType.typeName == "long")
    val rows = df.collect()
    assert(rows.count(!_.isNullAt(5)) == 1)
    assert(rows.count(r => !r.isNullAt(0) && r.getLong(0) == 7L) == 1)
  }

  private def writeGzLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_gz_spec")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("part-00000.json.gz")))
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()
    dir.toString
  }

  test("gz shards: corrupt-record routing survives the codec path (batch + stream)") {
    val spark = TestSpark.spark
    val lines = Seq(
      """{"doc_id":1,"text":"hello","lang":"en","source":"web","n_chars":5}""",
      """garbage line inside gz""",
      """{"doc_id":2,"text":"ok","lang":"de","source":"web","n_chars":2}""")
    val dir = writeGzLines(lines)
    // batch: decompression happens before line parsing, so the bad
    // line quarantines exactly as in plaintext
    val rows = JsonlTools.readJsonl(spark, dir).collect()
    assert(rows.count(_.isNullAt(5)) == 2)
    assert(rows.filter(!_.isNullAt(5)).map(_.getString(5)).toSeq ==
      Seq("garbage line inside gz"))
    // stream: same shard through the file-stream source; drain one
    // batch and compare the routed split
    val q = JsonlTools.readStreamJsonl(spark, dir)
      .withColumn("corrupt", col("_corrupt_record").isNotNull)
      .select("doc_id", "corrupt")
      .writeStream.format("memory").queryName("gz_routing")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("gz_routing").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getBoolean(1)))
      .toSet
    assert(got == Set((1L, false), (2L, false), (-1L, true)))
  }

  test("streaming ingest dedups across triggers on a multi-file landing zone") {
    // the landing-zone shape: 4 JSONL shards, every document repeated
    // in TWO different shards, so suppression must span trigger
    // boundaries (in-batch dedup alone would double-count everything)
    val spark = TestSpark.spark
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("jsonl_stream").toString
    val docs = (0 until 40).map(i =>
      (i.toLong, s"text body $i ${"pad " * (i % 5)}".trim, "en",
        if (i % 2 == 0) "web" else "books", 0L))
    for (shard <- 0 until 4) {
      val mine = docs.filter(_._1 % 4 == shard) ++
        docs.filter(d => (d._1 + 1) % 4 == shard) // each doc in 2 shards
      val tmp = java.nio.file.Files.createTempDirectory("jsonl_shard").toString
      mine.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".json")).head
      val parquetDocsDir = new java.io.File(d, "shards")
      parquetDocsDir.mkdirs()
      java.nio.file.Files.copy(part.toPath,
        parquetDocsDir.toPath.resolve(s"shard-$shard.json"))
    }
    val name = s"jsonl_ingest_${System.nanoTime()}"
    val q = JsonlTools.readStreamJsonl(spark, s"$d/shards")
      .filter(col("text").isNotNull)
      .withColumn("h", md5(col("text")))
      .dropDuplicates("source", "h")
      .writeStream.outputMode("append")
      .option("maxFilesPerTrigger", "1") // force one shard per trigger
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).groupBy("source")
      .agg(count(lit(1)).as("n")).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("books", 20L), ("web", 20L)),
      s"cross-trigger duplicates not suppressed: $got")
  }

  test("round trip reproduces the parquet originals exactly") {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$d/documents.parquet").exists)
    val got = JsonlTools.roundTrip(spark, d)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val exp = graft.Tables.documents(spark, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), lit(0L).as("n_corrupt"),
        sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == exp)
  }
}
