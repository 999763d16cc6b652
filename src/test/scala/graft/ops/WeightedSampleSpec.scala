package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Systematic PPS sampling: the telescoping multiplicity sum must hit
  * the target k EXACTLY, selection must be weight-monotone, and the
  * whole draw must be a pure function of the data — independent of
  * partitioning, hence of cluster shape. A local reference
  * implementation (sort by the same hash key, running mass, same
  * floor-division points) pins the distributed two-phase prefix sum.
  */
class WeightedSampleSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private val k = 1000L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("multiplicities telescope to exactly k") {
    val drawn = Curation.weightedSample(TestSpark.spark, dir)
      .agg(sum(col("mult"))).collect()(0).getLong(0)
    assert(drawn == k, s"systematic PPS must draw exactly $k, got $drawn")
  }

  test("distributed draw matches the local reference exactly") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ordered = docs.map { case (id, w) =>
      (java.lang.Long.parseLong(md5hex(s"pps|$id").take(15), 16), id, w)
    }.sortBy(t => (t._1, t._2))
    val tw = ordered.map(_._3).sum
    var cw = 0L
    val expected = ordered.flatMap { case (_, id, w) =>
      val m = (cw + w) * k / tw - cw * k / tw
      cw += w
      if (m >= 1) Some(id -> m) else None
    }.toMap
    val got = Curation.weightedSample(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("per-stratum PPS draws exactly k inside EVERY language") {
    val perLang = Curation.stratifiedWeighted(TestSpark.spark, dir)
      .groupBy("lang").agg(sum(col("mult")).as("drawn")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = graft.Tables.documents(TestSpark.spark, dir)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(perLang.keySet == langs, "every stratum must be sampled")
    perLang.foreach { case (l, n) =>
      assert(n == 200L, s"stratum $l drew $n, want exactly 200")
    }
  }

  test("per-stratum draw matches a per-stratum local reference") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).iterator.flatMap { case (_, ds) =>
      val ordered = ds.map { case (id, _, w) =>
        (java.lang.Long.parseLong(md5hex(s"spps|$id").take(15), 16), id, w)
      }.sortBy(t => (t._1, t._2))
      val tw = ordered.map(_._3).sum
      var cw = 0L
      ordered.flatMap { case (_, id, w) =>
        val m = (cw + w) * 200L / tw - cw * 200L / tw
        cw += w
        if (m >= 1) Some(id -> m) else None
      }
    }.toMap
    val got = Curation.stratifiedWeighted(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected)
  }

  test("every document heavier than one step is always drawn") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, dir)
    val tw = docs.agg(sum(col("n_chars"))).collect()(0).getLong(0)
    val heavy = docs.filter(col("n_chars") * k >= tw)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val drawn = Curation.weightedSample(s, dir).collect()
      .map(_.getLong(0)).toSet
    assert(heavy.subsetOf(drawn),
      "a span longer than the sampling step must contain a point")
  }
}
