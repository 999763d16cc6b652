package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import graft.functions.SimHashExpr

/** The native SimHash expression must match the explode+groupBy
  * formulation (and therefore the DuckDB oracle) bit-for-bit, work
  * from SQL via its registered name, and stay inside whole-stage
  * codegen.
  */
class SimHashExprSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("expression equals the exploded reference formulation") {
    val spark = TestSpark.spark
    val a = Dedup.simhash(spark, dir).orderBy("doc_id").collect().toSeq
    val b = Dedup.simhashExploded(spark, dir).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("registered SQL function and codegen") {
    val spark = TestSpark.spark
    SimHashExpr.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("docs_simhash_t")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(array_distinct(split(text, ' '))) AS simhash
        |FROM docs_simhash_t""".stripMargin)
    val direct = Dedup.simhash(spark, dir)
    assert(viaSql.orderBy("doc_id").collect().toSeq ==
      direct.orderBy("doc_id").collect().toSeq)
    // the expression must not force a codegen fallback: the Project
    // carrying graft_simhash must sit inside a codegen stage (the `*(n)`
    // prefix in the executed plan)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_simhash"),
      plan)
  }

  test("null tokens are ignored; distinct semantics hold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a", "b")),
      (2L, Seq("a", "b"))).toDF("id", "t")
    val r = df.select(col("id"),
      SimHashExpr.simhash(col("t")).as("h")).collect()
    assert(r(0).getLong(1) == r(1).getLong(1),
      "duplicate tokens must not change the vote")
  }
}
