package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

class BehaviorSpec extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"

  test("funnel fold equals the relational three-join formulation") {
    val spark = TestSpark.spark
    val got = Behavior.funnel(spark, d).collect()(0)
    // reference: the shuffle-per-stage formulation the oracle uses
    val e = graft.Tables.events(spark, d)
      .select(col("user_id"), expr("ts_ns DIV 1000").as("tus"),
        col("event_type"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tus").as("t1"))
    val s2 = e.join(s1, "user_id")
      .filter(col("event_type") === "click" && col("tus") > col("t1"))
      .groupBy("user_id").agg(min("tus").as("t2"))
    val s3 = e.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("tus") > col("t2"))
      .groupBy("user_id").agg(min("tus").as("t3"))
    assert(got.getLong(0) == s1.count())
    assert(got.getLong(1) == s2.count())
    assert(got.getLong(2) == s3.count())
    // the funnel narrows monotonically and is non-trivial on the fixture
    assert(got.getLong(0) >= got.getLong(1) &&
      got.getLong(1) >= got.getLong(2) && got.getLong(0) > 0)
  }

  test("cohort retention partitions users at offset 0 and never grows") {
    val spark = TestSpark.spark
    val rows = Behavior.cohortRetention(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = graft.Tables.events(spark, d)
      .select("user_id").distinct().count()
    // every user appears in their own cohort's week-0 cell
    assert(rows.filter(_._2 == 0L).map(_._3).sum == users)
    // retention in any later week never exceeds the cohort's size
    val size0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.filter(_._2 > 0L).foreach { case (c, off, n) =>
      assert(n <= size0(c), s"cohort $c offset $off: $n > ${size0(c)}")
    }
  }

  test("attribution conserves purchase count and revenue in both models") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    // revenue_micro is decimal(38,0) through the agg (round-14 width
    // audit: a BIGINT micro column wraps past ~$9.2e12 per segment)
    // emitted as its digit STRING since round 15 (the driver's
    // cross-engine hash is type-sensitive on wide decimals)
    val rows = Behavior.attribution(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getString(3))))
    val purchases = graft.Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
    val nTotal = purchases.count()
    val revTotal = BigDecimal(purchases
      .agg((sum(graft.Tables.dec(col("value"))) * lit(1000000))
        .cast("decimal(38,0)"))
      .head().getDecimal(0))
    Seq("first", "last").foreach { m =>
      val part = rows.filter(_._1 == m)
      assert(part.map(_._3).sum == nTotal,
        s"$m-touch must credit every purchase exactly once")
      assert(part.map(_._4).sum == revTotal,
        s"$m-touch must conserve total revenue")
      // a purchase can never be its own touchpoint
      assert(!part.exists(_._2 == "purchase"),
        s"$m-touch credited 'purchase' as a touch type")
    }
  }
}
