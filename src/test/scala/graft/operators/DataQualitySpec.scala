package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

class DataQualitySpec extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"

  test("profile: one row per column, counts consistent with the table") {
    val spark = TestSpark.spark
    val rows = DataQuality.profile(spark, d).collect()
    assert(rows.length == 5)
    val n = graft.Tables.customer(spark, d).count()
    assert(rows.forall(_.getLong(1) == n), "n_rows must equal the table size")
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    // the PK is unique and non-null
    assert(byCol("c_custkey").getLong(2) == 0L)
    assert(byCol("c_custkey").getLong(3) == n)
    // a low-cardinality dimension column profiles as such
    assert(byCol("c_mktsegment").getLong(3) < n / 10)
    // null + distinct never exceed the row count
    rows.foreach { r =>
      assert(r.getLong(2) <= n && r.getLong(3) <= n)
    }
  }

  test("integrity: five FK edges, orphans bounded by the child count") {
    val spark = TestSpark.spark
    val rows = DataQuality.integrity(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == Set(
      "lineitem.l_orderkey", "lineitem.l_partkey", "lineitem.l_suppkey",
      "orders.o_custkey", "customer.c_nationkey"))
    rows.foreach { case (fk, nChild, nOrphans) =>
      assert(nChild > 0, s"$fk: empty child")
      assert(nOrphans >= 0 && nOrphans <= nChild, s"$fk: orphan bound")
    }
    // the generated star schema is referentially intact on the dims
    val dims = rows.filter(r => r._1.endsWith("nationkey"))
    assert(dims.forall(_._3 == 0L))
  }

  test("skew: buckets partition the keys and bound the sizes") {
    val spark = TestSpark.spark
    val rows = DataQuality.skew(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nKeys = graft.Tables.lineitem(spark, d)
      .select("l_partkey").distinct().count()
    assert(rows.map(_._2).sum == nKeys, "buckets must partition the key set")
    rows.foreach { case (b, _, mn, mx) =>
      assert(mn >= (1L << b) && mx < (1L << (b + 1)),
        s"bucket $b must contain sizes in [2^$b, 2^${b + 1})")
    }
  }
}
