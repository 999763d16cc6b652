package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The native single-pass stopword counter must equal the declarative
  * size(filter(split(...), isin(...))) form pointwise — including on
  * repeated/trailing separators, empty and null text — and stay inside
  * whole-stage codegen.
  */
class StopwordHitsExprSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val words = Seq("the", "a", "of", "and", "is")

  test("equals the declarative formulation on the corpus and edge cases") {
    val spark = TestSpark.spark
    import spark.implicits._
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text"))
    val edges = Seq("", " ", "the", " the", "the ", "the  the", "a  ",
      "THE the tHe", "und the is öf", "a a a a", null.asInstanceOf[String])
      .toDF("text")
    Seq(corpus, edges).foreach { df =>
      val both = df.select(
        StopwordHitsExpr.stopwordHits(col("text"), words).as("native"),
        TestAccess.declarative(col("text"), words).as("decl"))
      val bad = both.filter(!(col("native") <=> col("decl"))).count()
      assert(bad == 0L, s"native != declarative on $bad rows")
    }
  }

  test("SQL registration and codegen") {
    val spark = TestSpark.spark
    StopwordHitsExpr.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("docs_sw_t")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_stopword_hits(text, 'the,a,of,and,is') AS n
        |FROM docs_sw_t""".stripMargin)
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        StopwordHitsExpr.stopwordHits(col("text"), words).as("n"))
    assert(viaSql.orderBy("doc_id").collect().toSeq ==
      direct.orderBy("doc_id").collect().toSeq)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") &&
      plan.contains("graft_stopword_hits"), plan)
  }

  test("non-literal or empty word list fails loudly") {
    intercept[IllegalArgumentException] {
      StopwordHitsExpr(org.apache.spark.sql.GraftBridge
        .expression(col("text")), Seq.empty)
    }
  }
}

/** Bridges the package-private declarative twin out of ops for the
  * equivalence assertion.
  */
object TestAccess {
  def declarative(text: org.apache.spark.sql.Column, words: Seq[String]) =
    graft.ops.TextAnalysis.hitsDeclarative(
      split(text, " "), words)
}
