package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The hierarchical prefix-sum packing must be invariant in the chunk
  * size — any chunking (including one so large it degenerates to the
  * flat single-window formulation) yields the same bins, because
  * addition is associative. This is the property that lets the 100 TB
  * plan and the oracle's flat SQL be the same operator.
  */
class CurationSpec extends AnyFunSuite {
  test("packing bins are invariant in the chunk size") {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    def bins(chunkDocs: Int): Seq[(Long, Long)] =
      Curation.pack(spark, d, chunkDocs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3)))
        .sortBy(_._1).toSeq
    val flat = bins(Int.MaxValue) // one chunk ≅ the oracle's flat window
    assert(flat.nonEmpty && flat.exists(_._2 > 0), "need multiple bins")
    Seq(1, 3, 50).foreach { c =>
      assert(bins(c) == flat, s"chunkDocs=$c diverged from flat packing")
    }
  }

  test("row-local repetition fold equals the explode+groupBy formulation") {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val got = Curation.repetition(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    // reference: the shuffle-heavy formulation the oracle uses
    val toks = graft.Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .withColumn("sh", explode(transform(
        sequence(lit(0), size(col("t")) - 2),
        i => concat_ws(" ", element_at(col("t"), i + 1),
          element_at(col("t"), i + 2)))))
    val ref = toks.groupBy("doc_id", "sh").count()
      .groupBy("doc_id")
      .agg(sum(col("count")).cast("int").as("n_grams"),
        round((sum(col("count")) - count(lit(1))) / sum(col("count")), 6)
          .as("dup_frac"),
        round(max(col("count")) / sum(col("count")), 6).as("top_frac"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got.nonEmpty && got == ref)
    assert(got.exists(_._3 > 0), "corpus should contain some repetition")
  }

  test("contamination never reports benchmark docs and bounds the fraction") {
    val spark = TestSpark.spark
    val rows = Curation.contamination(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "synthetic corpus should share shingles")
    assert(rows.forall(_._1 % 101 != 0), "benchmark side leaked into output")
    assert(rows.forall { case (_, hits, frac) =>
      hits >= 1 && frac > 0.0 && frac <= 1.0 })
  }

  test("dsir favors the target domain and scores every tokenized doc") {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val scored = Curation.dsir(spark, d)
      .join(graft.Tables.documents(spark, d).select("doc_id", "lang"), "doc_id")
    val n = graft.Tables.documents(spark, d).count()
    assert(scored.count() == n, "every document must receive a score")
    val means = scored
      .groupBy(col("lang") === "en")
      .agg(avg(col("score_micro") / col("n_tokens")).as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(means(true) > means(false),
      s"target-domain docs must score higher per token: $means")
  }

  test("shuffle order is a 0-based permutation consistent with its key") {
    // the scale path composes positions from monotonically_increasing_id
    // partition encodings + per-partition offsets; the CONTRACT is that
    // this equals the flat "row_number over global key order" the oracle
    // states. Pin: pos is exactly 0..n-1, ordered by (shuffle_key,
    // doc_id), and a re-run is bit-identical (pure function of doc_id).
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val rows = Curation.shuffleOrder(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_._3).sorted.toSeq == (0L until n).toSeq,
      "pos must be exactly 0..n-1")
    val byPos = rows.sortBy(_._3).map(x => (x._2, x._1)).toSeq
    assert(byPos == byPos.sorted,
      "pos order must equal (shuffle_key, doc_id) order")
    // deterministic: the epoch order re-derives bit-identically
    val again = Curation.shuffleOrder(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.sortBy(_._1).toSeq == again.toSeq)
    // and it is a genuine shuffle: not the identity order over doc_id
    assert(byPos.map(_._2) != byPos.map(_._2).sorted,
      "shuffle should not preserve doc_id order")
  }

  test("upsample balances the language mix and preserves total mass") {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Curation.upsample(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // (doc_id, rep) pairs are unique — replication, not duplication bugs
    assert(out.map(x => (x._1, x._3)).distinct.length == out.length)
    val byLang = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.values.sum
    val target = n / docs.size
    // every language lands near the uniform target (fractional hash
    // rounding is per-doc ±1, so allow a generous band), which means
    // rare languages were up-sampled and dominant ones down-sampled
    byLang.foreach { case (l, m) =>
      assert(math.abs(m - target) <= math.max(3L, target / 3),
        s"$l: $m rows vs uniform target $target (natural ${docs(l)})")
    }
    val rarest = docs.minBy(_._2)._1
    val top = docs.maxBy(_._2)._1
    assert(byLang(rarest) >= docs(rarest), "rarest language must up-sample")
    assert(byLang(top) <= docs(top), "dominant language must down-sample")
    // total mass ≈ N: the mix redistributes, it does not grow the epoch
    assert(math.abs(out.length - n) <= docs.size * 2,
      s"total ${out.length} vs corpus $n")
    // deterministic
    val again = Curation.upsample(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("upsample caps a rare language's replication at 100x (constructed skew)") {
    // 300 docs of one language + 1 doc of another: the uncapped ratio
    // for the rare doc is 301/(2*1) = 150.5x — past the 100x ceiling
    // that bounds per-row sequence arrays, partition skew, and
    // same-doc epoch mass at corpus scale. The cap lands exactly:
    // r_micro = 100e6, zero fractional part, so exactly 100 copies.
    val spark = graft.etl.TestSpark.spark
    import spark.implicits._
    val docs = ((1L to 300L).map(i => (i, "big")) :+ (9999L, "rare"))
      .toDF("doc_id", "lang")
    val out = Curation.upsampleOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rare = out.count(_._1 == 9999L)
    assert(rare == 100, s"rare-doc copies: $rare != 100")
    // the big language's ratio is 301/600 < 1: every doc gets 0 or 1
    // copies, never more
    val perBig = out.filter(_._2 == "big").groupBy(_._1).map(_._2.size)
    assert(perBig.forall(_ == 1), "big-lang docs must not replicate")
  }
}
