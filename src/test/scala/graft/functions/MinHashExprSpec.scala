package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import graft.ops.Dedup

/** The native MinHash expression must match the explode+groupBy
  * formulation (and therefore the DuckDB oracle) bit-for-bit, and stay
  * inside whole-stage codegen.
  */
class MinHashExprSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("expression equals the exploded reference formulation") {
    val spark = TestSpark.spark
    val a = Dedup.minhashSig(spark, dir).orderBy("doc_id").collect().toSeq
    val b = Dedup.minhashSigExploded(spark, dir).orderBy("doc_id")
      .collect().toSeq
    assert(a == b)
  }

  test("degenerate documents (null/empty text) keep the twins identical") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("minhash_degenerate").toString
    Seq((1L, "alpha beta gamma"), (2L, null.asInstanceOf[String]),
      (3L, ""), (4L, "alpha"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val a = Dedup.minhashSig(spark, tmp).orderBy("doc_id").collect().toSeq
    val b = Dedup.minhashSigExploded(spark, tmp).orderBy("doc_id")
      .collect().toSeq
    assert(a == b)
    // contract: the null-text document emits no signature row; the
    // empty string still tokenizes to [""] and gets one
    assert(a.map(_.getLong(0)) == Seq(1L, 3L, 4L))
    assert(a.forall(r => (0 until r.length).forall(!r.isNullAt(_))))
  }

  test("registered SQL function and codegen") {
    val spark = TestSpark.spark
    MinHashExpr.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("docs_minhash_t")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_minhash(array_distinct(split(text, ' ')))[0] AS m0
        |FROM docs_minhash_t""".stripMargin)
    val direct = Dedup.minhashSig(spark, dir).select("doc_id", "m0")
    assert(viaSql.orderBy("doc_id").collect().toSeq ==
      direct.orderBy("doc_id").collect().toSeq)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_minhash"),
      plan)
  }
}
