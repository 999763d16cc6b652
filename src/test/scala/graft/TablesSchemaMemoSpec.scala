package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Round-19 pin for the Tables.t schema memo: the memo must be
  * invisible (same schema inference would return) AND must re-derive
  * when the table is rewritten at the same path — the fingerprint
  * rule every graft memo keys on. A stale hit here would make a
  * rewritten fixture read with the OLD column set, the exact bug
  * class the fingerprint exists to prevent.
  */
class TablesSchemaMemoSpec extends AnyFunSuite {

  test("memo returns the inferred schema, and invalidates on rewrite") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("schema_memo").toString

    Seq((1L, "a")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val first = Tables.t(spark, dir, "documents")
    assert(first.schema.fieldNames.toSeq == Seq("id", "v"))
    // second read hits the memo — same schema object content
    assert(Tables.t(spark, dir, "documents").schema == first.schema)

    // rewrite at the SAME path with a different column set; bump the
    // mtime past 1 s granularity so the fingerprint is guaranteed to
    // move even on coarse filesystems
    Seq((1L, "a", 7L)).toDF("id", "v", "extra")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val f = new java.io.File(s"$dir/documents.parquet")
    val parts = Option(f.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    parts.foreach(p => p.setLastModified(p.lastModified() + 5000L))

    val second = Tables.t(spark, dir, "documents")
    assert(second.schema.fieldNames.toSeq == Seq("id", "v", "extra"),
      s"stale schema memo survived a rewrite: ${second.schema.fieldNames.toSeq}")
    assert(second.select(col("extra")).head().getLong(0) == 7L)
    graft.etl.Directory.deleteRecursively(new java.io.File(dir))
  }
}
