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
