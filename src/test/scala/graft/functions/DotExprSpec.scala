package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The native dot product must match the declarative lambda fold
  * bit-for-bit (same left-to-right summation), propagate nulls the
  * same way, resolve from SQL, and stay inside whole-stage codegen.
  */
class DotExprSpec extends AnyFunSuite {

  test("equals the aggregate(zip_with) fold bit-for-bit on the corpus") {
    val spark = TestSpark.spark
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("le"))
    val both = e.select(col("vec_id"),
      DotExpr.dot(col("le"), col("le")).as("native"),
      aggregate(zip_with(col("le"), col("le"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("lambda"))
      .collect()
    both.foreach { r =>
      // bit-identical, not approximately equal: same fold order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: native ${r.getDouble(1)} != lambda ${r.getDouble(2)}")
    }
  }

  test("null propagation matches the lambda fold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)),
      (4L, null, Seq[java.lang.Double](3.0, 4.0)))
      .toDF("id", "a", "b")
    val r = df.select(col("id"), DotExpr.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) == 11.0)
    assert(r(1).isNullAt(1), "null element must yield null")
    assert(r(2).isNullAt(1), "length mismatch must yield null")
    assert(r(3).isNullAt(1), "null array must yield null")
  }

  test("registered SQL function and codegen") {
    val spark = TestSpark.spark
    DotExpr.register(spark)
    // materialize array<double> input first: a transform() lambda in the
    // same Project is CodegenFallback and would evict the whole stage,
    // hiding whether graft_dot itself stays codegen-compatible
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dot").toString + "/emb"
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("le"))
      .write.parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("emb_dot_t")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_dot(le, le) AS n2 FROM emb_dot_t")
    assert(viaSql.count() > 0)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_dot"), plan)
  }
}
