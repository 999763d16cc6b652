package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** A 100 TB corpus always contains degenerate documents — null text,
  * empty text, single tokens, separator runs, exotic unicode. Every
  * text-path operator must process such a corpus without throwing and
  * without dropping the WELL-FORMED rows around the degenerate ones.
  * (The per-operator contracts for what a degenerate row itself yields
  * — a null stat, a dropped signature — live in the operator specs;
  * this is the fleet-wide no-crash/no-collateral gate.)
  */
class DegenerateCorpusSpec extends AnyFunSuite {

  private lazy val dir: String = {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("degenerate_corpus").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web", "en", 43L),
      (2L, null.asInstanceOf[String], "web", "en", 0L),
      (3L, "", "books", "de", 0L),
      (4L, "solo", "books", "es", 4L),
      (5L, "   ", "web", "fr", 3L),
      (6L, "der die und das ist a of the", "wiki", "de", 29L),
      (7L, "ß 密 🙂 Ωmega", "wiki", "en", 11L),
      (8L, ("tok " * 500).trim, "web", "en", 1999L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = {
    val s = TestSpark.spark
    Seq(
      "textStats" -> (() => TextAnalysis.textStats(s, dir)),
      "langId" -> (() => TextAnalysis.langId(s, dir)),
      "fingerprint" -> (() => TextAnalysis.fingerprint(s, dir)),
      "tokenCount" -> (() => TextAnalysis.tokenCount(s, dir)),
      "tfidf" -> (() => TextAnalysis.tfidf(s, dir)),
      "exact" -> (() => Dedup.exact(s, dir)),
      "minhashSig" -> (() => Dedup.minhashSig(s, dir)),
      "simhash" -> (() => Dedup.simhash(s, dir)),
      "heavyHitters" -> (() => TextAnalysis.heavyHitters(s, dir)),
      "chunk" -> (() => TextAnalysis.chunk(s, dir)),
      "boilerplate" -> (() => Curation.boilerplate(s, dir)),
      "repetition" -> (() => Curation.repetition(s, dir)),
      "sample" -> (() => Curation.sample(s, dir)),
      "split" -> (() => Curation.split(s, dir)),
      "lengthGate" -> (() => Curation.lengthGate(s, dir)),
      "sources" -> (() => Curation.sources(s, dir)),
      "mixture" -> (() => Curation.mixture(s, dir)),
      "manifest" -> (() => Curation.manifest(s, dir)),
      "keepList" -> (() => Dedup.keepList(s, dir)),
      "postings" -> (() => TextAnalysis.postings(s, dir)),
      "diversity" -> (() => TextAnalysis.diversity(s, dir)),
      "bpeStep" -> (() => TextAnalysis.bpeStep(s, dir)),
      "bpeTrain" -> (() => TextAnalysis.bpeTrain(s, dir, rounds = 3)),
      "bpeEncode" -> (() => TextAnalysis.bpeEncode(s, dir)),
      "jsonlRoundTrip" -> (() => graft.tools.JsonlTools.roundTrip(s, dir)),
      "cooccurrence" -> (() => TextAnalysis.cooccurrence(s, dir)),
      "bigramLm" -> (() => TextAnalysis.bigramLm(s, dir)),
      "lmScore" -> (() => TextAnalysis.lmScore(s, dir)),
      "corpusPipeline" -> (() => TextAnalysis.corpusPipeline(s, dir)),
      "ngramJaccard" -> (() => Dedup.ngramJaccard(s, dir)),
      "containment" -> (() => Dedup.containment(s, dir)),
      "lshPairs" -> (() => Dedup.lshPairs(s, dir)),
      "simhashPairs" -> (() => Dedup.simhashPairs(s, dir)),
      "consensusPairs" -> (() => Dedup.consensusPairs(s, dir)),
      "dupGroups" -> (() => Dedup.dupGroups(s, dir)),
      "canonical" -> (() => Dedup.canonical(s, dir)),
      "paragraphDedup" -> (() => Dedup.paragraphDedup(s, dir)),
      "dedupReport" -> (() => Dedup.dedupReport(s, dir)),
      "contamination" -> (() => Curation.contamination(s, dir)),
      "qualitySample" -> (() => Curation.qualitySample(s, dir)),
      "stratified" -> (() => Curation.stratified(s, dir)),
      "dsir" -> (() => Curation.dsir(s, dir)),
      "quota" -> (() => Curation.quota(s, dir)),
      "pack" -> (() => Curation.pack(s, dir)),
      "classifier" -> (() => Curation.classifier(s, dir)),
      "curationPipeline" -> (() => Curation.curationPipeline(s, dir)),
      "incrementalDedup" -> (() => Curation.incrementalDedup(s, dir)))
  }

  // probabilistic cuts may legitimately select nothing from 8 docs;
  // contamination's benchmark side (doc_id % 101 == 0) is empty here
  private val mayBeEmpty = Set("sample", "boilerplate", "contamination")

  test("text operators survive a corpus with null/empty/unicode documents") {
    ops.foreach { case (name, f) =>
      val rows = try f().collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the degenerate corpus: $e")
      }
      assert(rows.nonEmpty || mayBeEmpty(name),
        s"$name returned no rows at all")
    }
  }

  test("well-formed rows are not collateral damage of degenerate ones") {
    val s = TestSpark.spark
    // doc 1 must keep full, correct stats despite its null/empty peers
    val st = TextAnalysis.textStats(s, dir)
      .filter(col("doc_id") === 1L).collect()
    assert(st.length == 1 && st(0).getAs[Long]("n_tokens") == 9L)
    // the null-text doc yields null stats, not a crash and not a drop
    val nullRow = TextAnalysis.textStats(s, dir)
      .filter(col("doc_id") === 2L).collect()
    assert(nullRow.length == 1 && nullRow(0).isNullAt(
      nullRow(0).fieldIndex("n_tokens")))
    // dedup signatures exist for every tokenizable doc (null drops per
    // the minhashSig contract; empty string still tokenizes to [""])
    val sigs = Dedup.minhashSig(s, dir).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(sigs == Set(1L, 3L, 4L, 5L, 6L, 7L, 8L), sigs.toString)
  }
}
