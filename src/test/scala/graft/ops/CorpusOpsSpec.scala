package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import graft.Tables._

/** Internal-consistency invariants for the corpus operators — the
  * properties the DuckDB hash gate can't see (it pins one dataset; these
  * pin the algebra).
  */
class CorpusOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("postings carry the smallest min(df,20) doc_ids, sorted unique") {
    val spark = TestSpark.spark
    val rows = TextAnalysis.postings(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      // postings render as a comma-joined string (scalar cell for the
      // verify gate's column compare) — parse it back for the invariants
      val posting = r.getString(2).split(",").toSeq.map(_.toLong)
      assert(posting.size == math.min(df, 20L), s"df=$df size=${posting.size}")
      assert(posting == posting.sorted && posting.distinct == posting,
        s"postings must be sorted unique doc_ids: $posting")
    }
  }

  test("hierarchical posting cap is invariant in the chunk size") {
    // top-20 of the per-chunk top-20s == global top-20, for any chunking
    val spark = TestSpark.spark
    def snap(c: Int) = TextAnalysis.postings(spark, dir, c).collect()
      .map(r => r.getString(0) -> r.getString(2)).sortBy(_._1).toSeq
    val flat = snap(Int.MaxValue)
    Seq(1, 7, 1000).foreach { c =>
      assert(snap(c) == flat, s"chunkDocs=$c diverged")
    }
  }

  test("tf-idf emits at most 3 dense-ranked terms per document") {
    val spark = TestSpark.spark
    val byDoc = TextAnalysis.tfidf(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, rs) =>
      val rks = rs.map(_.getInt(4)).sorted.toSeq
      assert(rks == (1 to rs.length), s"doc $doc ranks not dense: $rks")
      assert(rs.length <= 3, s"doc $doc has ${rs.length} rows")
    }
  }

  test("length gate keeps the central ~90% of the corpus") {
    val spark = TestSpark.spark
    val kept = Curation.lengthGate(spark, dir).agg(sum("n_kept")).head.getLong(0)
    val total = documents(spark, dir).count()
    assert(kept <= total && kept >= (total * 0.8).toLong,
      s"kept $kept of $total — percentile band is wrong")
  }

  test("stratified sample is a superset-rate refinement of the flat sample") {
    // with the 'en' rate at 250 and the flat sample at 100, every
    // non-'en' stratified doc must also be in a rate-100 cut of its
    // stratum — i.e. counts per lang obey n(rate100) <= n(stratified)
    val spark = TestSpark.spark
    val strat = Curation.stratified(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val flat = Curation.sample(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    flat.foreach { case (lang, n) =>
      assert(strat.getOrElse(lang, 0L) >= n,
        s"stratified($lang)=${strat.get(lang)} < flat $n")
    }
  }

  test("canonical selection keeps exactly one longest doc per dup group") {
    val spark = TestSpark.spark
    val rows = Dedup.canonical(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty, "fixture should contain dup groups")
    val chars = documents(spark, dir).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (g, members) =>
      val canon = members.filter(_._4)
      assert(canon.length == 1, s"group $g has ${canon.length} canonicals")
      assert(members.forall(_._3 == canon.head._1),
        s"group $g members disagree on canonical_id")
      val cChars = chars(canon.head._1)
      members.foreach { m =>
        assert(chars(m._1) < cChars ||
          (chars(m._1) == cChars && m._1 >= canon.head._1),
          s"group $g: member ${m._1} beats canonical ${canon.head._1}")
      }
    }
  }

  test("semantic dedup witnesses are lower-id cell-mates above threshold") {
    val spark = TestSpark.spark
    val rows = Similarity.semanticDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, dupOf, sim) =>
      assert(dupOf < v, s"witness $dupOf must precede $v")
      assert(sim >= 0.3, s"below-threshold witness survived: $sim")
    }
    // pruning is stable: a vec appears at most once
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("chunking covers every token exactly once per stride window") {
    val spark = TestSpark.spark
    val chunks = TextAnalysis.chunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docToks = documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").length.toLong).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = docToks(doc)
      val sorted = cs.sortBy(_._2)
      // indices are contiguous from 0 and the count matches the stride
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq)
      assert(sorted.length == ((n - 1) / 24 + 1),
        s"doc $doc: ${sorted.length} chunks for $n tokens")
      // each window holds exactly the tokens between its start and the
      // earlier of (start+32, document end) — full coverage, no gaps
      sorted.foreach { case (_, idx, len) =>
        assert(len == math.min(32L, n - idx * 24), s"doc $doc chunk $idx")
      }
    }
  }

  test("mixture weights are a sub-unit partition proportional to isqrt") {
    val spark = TestSpark.spark
    val rows = Curation.mixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val totalW = rows.map(_._3).sum
    // truncating division: the weights sum to ≤ 1e6, within one
    // truncation unit per source
    assert(totalW <= 1000000L && totalW >= 1000000L - rows.length,
      s"weights sum $totalW outside the truncation band")
    // monotone: a strictly larger source never gets a smaller weight
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, n1, w1), (_, n2, w2)) =>
        if (n1 < n2) assert(w1 <= w2)
      case _ => ()
    }
  }

  test("consensus pairs: two-signal pairs appear in both candidate sets") {
    val spark = TestSpark.spark
    val cons = Dedup.consensusPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(cons.nonEmpty)
    val lsh = Dedup.lshPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    cons.foreach { case (p, n) =>
      assert(n == 1L || n == 2L)
      if (n == 2L) assert(lsh.contains(p), s"2-signal pair $p not in LSH set")
    }
  }

  test("corpus sink lays out (split, lang) partitions that prune on read") {
    val spark = TestSpark.spark
    val out = java.nio.file.Files
      .createTempDirectory("graft-corpus").toString + "/corpus"
    val mf = Curation.writeCorpus(spark, dir, out).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(mf.nonEmpty)
    val splits = new java.io.File(out).listFiles
      .filter(_.isDirectory).map(_.getName)
    assert(splits.nonEmpty && splits.forall(_.startsWith("split=")),
      splits.mkString(","))
    val rb = spark.read.parquet(out)
      .filter(col("split") === "train" && col("lang") === "en")
    val plan = rb.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"),
      s"expected partition pruning in:\n$plan")
    assert(rb.count() == mf(("train", "en")),
      "read-back count must match the published manifest")
  }

  test("paragraph dedup keeps exactly the globally-first chunk occurrence") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("para_dedup").toString
    def block(tok: String) = Seq.fill(16)(tok).mkString(" ")
    val (a, b, c) = (block("a"), block("b"), block("c"))
    Seq(
      (1L, s"$a $b", "web", "en", 0L),   // first owner of A and B
      (2L, s"$a $c", "web", "en", 0L),   // A dropped, C kept
      (3L, s"$b $b", "web", "en", 0L))   // both copies of B dropped
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.paragraphDedup(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((2L, 2L, s"$a $b")))
    assert(rows(2L) == ((2L, 1L, c)))
    assert(rows(3L) == ((2L, 0L, "")))
  }

  test("paragraph dedup reassembles untouched documents verbatim") {
    val spark = TestSpark.spark
    val clean = Dedup.paragraphDedup(spark, dir)
      .filter(col("n_kept") === col("n_chunks"))
      .join(documents(spark, dir), "doc_id")
      .filter(col("text_clean") =!= col("text"))
    assert(clean.isEmpty,
      "a document with no dropped chunks must reassemble to its input")
  }

  test("lm score sums are consistent with integer division") {
    val spark = TestSpark.spark
    val rows = TextAnalysis.lmScore(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (nBi, nOov, score, avg) =>
      assert(nOov >= 0 && nOov <= nBi)
      assert(score >= 0)
      // avg = score DIV n  ⇒  avg·n ≤ score < (avg+1)·n
      assert(avg * nBi <= score && score < (avg + 1) * nBi,
        s"avg=$avg n=$nBi score=$score")
      // every in-vocab bigram contributes p_micro ≤ 1e6
      assert(score <= (nBi - nOov) * 1000000L,
        s"score $score exceeds max mass for ${nBi - nOov} in-vocab bigrams")
    }
  }

  test("novelty is bounded, exact verbatim copies score zero") {
    val spark = TestSpark.spark
    import spark.implicits._
    // two verbatim copies + one unique doc: the copies share every
    // trigram (novelty 0), the unique doc shares none (novelty 1e6)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a", 1L),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "b", 1L),
      (3L, "one two three four five six seven", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("nov").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.novelty(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L)._3 == 0L && out(2L)._3 == 0L,
      s"verbatim copies must have zero novelty: $out")
    assert(out(3L)._3 == 1000000L, s"unique doc must be fully novel: $out")
    // fixture-wide bounds: 0 <= n_shared <= n_grams, novelty in [0, 1e6]
    TextAnalysis.novelty(spark, dir).collect().foreach { r =>
      val (n, sh, nv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && sh >= 0 && sh <= n && nv >= 0 && nv <= 1000000L,
        s"out-of-bounds novelty row: n=$n shared=$sh novelty=$nv")
    }
  }

  test("cross-source matrix accounts for every candidate pair exactly once") {
    val spark = TestSpark.spark
    val pairs = Dedup.lshPairs(spark, dir).count()
    val m = Dedup.crossSourceMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(m.map(_._3).sum == pairs,
      "matrix cells must partition the candidate pair set")
    m.foreach { case (a, b, _) =>
      assert(a <= b, s"cells must be unordered-normalized: ($a, $b)")
    }
  }
}
