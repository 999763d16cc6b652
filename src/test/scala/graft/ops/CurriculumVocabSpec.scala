package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Pins the two schedule-facing corpus operators added in round 10:
  * the token-budgeted curriculum cut and the vocabulary OOV audit.
  * The load-bearing property for the curriculum is that the
  * DISTRIBUTED running-mass machinery (range partition + per-partition
  * windows + offset broadcast) equals the flat single-window
  * formulation — the same invariance discipline as the packing spec.
  */
class CurriculumVocabSpec extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"

  test("curriculum phases partition the corpus and order by quality") {
    val spark = TestSpark.spark
    val rows = Curation.curriculum(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L),
      "exactly phases 0..3")
    val docs = graft.Tables.documents(spark, d)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(count(lit(1)), sum(col("n"))).collect()(0)
    assert(rows.map(_._2).sum == docs.getLong(0), "every doc in a phase")
    assert(rows.map(_._3).sum == docs.getLong(1), "every token in a phase")
    // quality is non-increasing across phases: phase k's worst doc is
    // no worse than phase k+1's best (ties may straddle the boundary)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 >= b._5, s"phase ${a._1} min ${a._4} < phase ${b._1} max ${b._5}")
    }
    // phase masses are equal to within one document's token count: the
    // cut is by cumulative mass, so no phase can overshoot its quarter
    // by more than the doc that crossed the boundary
    val maxDoc = graft.Tables.documents(spark, d)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    val target = docs.getLong(1) / 4.0
    rows.foreach { case (p, _, mass, _, _) =>
      assert(math.abs(mass - target) <= maxDoc,
        s"phase $p mass $mass vs target $target (maxDoc $maxDoc)")
    }
  }

  test("distributed running mass equals the flat single-window cut") {
    val spark = TestSpark.spark
    // flat formulation: one global window — correct but single-funnel
    // (the plan the operator exists to avoid); at spec scale it is the
    // executable oracle for the two-level offsets
    val sc = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"),
        split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        (lit(10L) * expr("(1000000 * CAST(size(filter(t, x -> x IN ('the','a','of','and','is'))) AS BIGINT)) DIV size(t)")
          - abs(expr("(1000000 * (n_chars - (size(t) - 1))) DIV size(t)")
            - lit(4500000L))).as("score_micro"))
    val w = Window.orderBy(col("score_micro").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flat = sc
      .withColumn("cum_in", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .crossJoin(broadcast(sc.agg(sum(col("n_tokens")).as("mt"))))
      .withColumn("phase", expr("(cum_in * 4) DIV mt"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        min(col("score_micro")).as("min_score"),
        max(col("score_micro")).as("max_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val got = Curation.curriculum(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == flat)
  }

  test("vocab OOV audit: occurrence totals and an independent recount") {
    val spark = TestSpark.spark
    val rows = TextAnalysis.vocabCoverage(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (src, nOcc, nOov, micro) =>
      assert(nOcc > 0 && nOov >= 0 && nOov <= nOcc, s"$src bounds")
      assert(micro == 1000000L * nOov / nOcc, s"$src micro-rate arithmetic")
    }
    // independent recount: build the top-1000 vocab driver-side from
    // raw token counts and recount OOV per source
    val occ = graft.Tables.documents(spark, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tk"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = occ.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (tk, c) => (-c, tk) }.take(1000).map(_._1).toSet
    val bySrc = occ.groupBy(_._1).view.mapValues { os =>
      (os.length.toLong, os.count(o => !vocab(o._2)).toLong)
    }.toMap
    rows.foreach { case (src, nOcc, nOov, _) =>
      assert((nOcc, nOov) == bySrc(src), s"$src recount mismatch")
    }
    // informativeness is corpus-dependent: with more distinct tokens
    // than vocab slots some mass MUST be OOV; with fewer, NONE may be
    // (the sf0.001 fixture sits under 1000 distinct tokens — the zero
    // branch is the degenerate-path pin, per the tri-SF lesson)
    val nDistinct = occ.map(_._2).distinct.length
    if (nDistinct > 1000)
      assert(rows.map(_._3).sum > 0, "no OOV mass despite vocab overflow")
    else
      assert(rows.map(_._3).sum == 0,
        s"OOV mass with only $nDistinct distinct tokens — vocab cut broken")
    assert(rows.exists(r => r._3 < r._2), "everything OOV — vocab unused")
  }
}
