package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-14 integer-width audit, made executable: the staged
  * micro-unit arithmetic exists because the direct forms wrap int64
  * (or lose double precision) at corpus magnitudes the parquet
  * fixtures cannot reach — so this spec evaluates the SHIPPED
  * expressions at overflow-regime LITERALS and pins them against
  * BigInt reference math. A regression back to the direct forms fails
  * here immediately instead of silently mis-scoring at 100 TB.
  *
  * Covered: the staged floor division (vocabCoverage, transitions),
  * the staged half-up rounding (bigramLm/lmScore), the capped BM25
  * term score, the decimal(19,0)² sums (diversity, burstiness), and
  * the per-factor-double product identity DSIR's weight ratio relies
  * on.
  */
class WidthAuditSpec extends AnyFunSuite {
  private lazy val spark = graft.etl.TestSpark.spark

  // (n, d) pairs spanning tiny fixture-like values through the
  // overflow regime: d up to ~9.2e15 (the staged forms' proven bound),
  // n <= d (both call sites divide a part by its total)
  private val cases: Seq[(Long, Long)] = Seq(
    (0L, 1L), (1L, 1L), (1L, 3L), (7L, 13L), (499L, 1000L),
    (500L, 1000L), (501L, 1000L), (999999L, 1000000L),
    (1L, 9223372036854L), // old 1e6*n form's last safe magnitude
    (9223372036855L, 9223372036855L), // just past it: old form wraps
    (4611686018427387L, 9223372036854775L), // ~2^62/1000 regime
    (123456789012345L, 987654321098765L),
    (9007199254740993L, 9007199254740993L)) // > 2^53: double form drifts

  test("staged floor division equals BigInt floor(1e6*n/d) past the int64 wrap point") {
    import spark.implicits._
    val got = cases.toDF("n", "d")
      .withColumn("stg", expr(
        "1000 * ((1000 * n) DIV d) + (1000 * ((1000 * n) % d)) DIV d"))
      .select("n", "d", "stg").as[(Long, Long, Long)].collect()
    got.foreach { case (n, d, stg) =>
      val want = (BigInt(1000000) * n / d).toLong
      assert(stg == want, s"floor(1e6*$n/$d): staged=$stg bigint=$want")
    }
    // and the direct form genuinely breaks where the staging matters:
    // the wrap point is the reason this spec exists
    val (n, d) = cases.maxBy(_._1)
    assert(BigInt(1000000) * n > Long.MaxValue &&
      1000000L * n / d != (BigInt(1000000) * n / d).toLong,
      "expected the un-staged product to wrap at the largest case")
  }

  test("pMicroStaged equals BigInt round-half-up(1e6*n/d) including ties and the overflow regime") {
    import spark.implicits._
    val tieCases = cases ++ Seq((1L, 2000000L), (3L, 2000000L),
      (1L, 8L), (3L, 8L)) // exact .5 landings under 1e6 scaling
    val got = tieCases.toDF("n", "d")
      .withColumn("stg", expr(TextAnalysis.pMicroStaged("n", "d")))
      .select("n", "d", "stg").as[(Long, Long, Long)].collect()
    got.foreach { case (n, d, stg) =>
      val num = BigInt(1000000) * n
      val want = ((num * 2 + d) / (BigInt(d) * 2)).toLong // half-up
      assert(stg == want, s"round(1e6*$n/$d): staged=$stg bigint=$want")
    }
  }

  test("BM25 term score matches the BigInt model with tf/avgdl/idf caps at extreme magnitudes") {
    import spark.implicits._
    // (tf, df, nDocs, avgdl, dl): fixture-small, web-scale, and the
    // adversarial corners — one-term-spam docs (tf huge), 1-in-N-docs
    // rarity (idf cap), 100 TB corpus counts
    val rows = Seq(
      (0L, 0L, 10L, 7L, 9L),
      (3L, 2L, 10L, 7L, 9L),
      (40000000L, 1L, 5L, 10000L, 40000000L), // tf far past the cap
      (2000000L, 1L, 2300000000000L, 10000L, 2000000L), // N ~ idf-cap regime
      (17L, 3L, 10000000000L, 10000L, 100000L), // 1e10 docs = 100 TB at 10 KB
      // n at the documented idf-headroom edge (N ≈ 2.3e12 docs keeps
      // 2e6·(2N+1) < 2^63) — past it the engine expression is out of
      // its proven domain by design, so the spec stays inside it
      (999983L, 999983L, 2000000000000L, 10000L, 1000003L))
      .toDF("tf_x", "df_x", "n_docs", "avgdl", "dl")
    val got = rows.withColumn("score", expr(TextAnalysis.bm25TermScoreSql("x")))
      .select("tf_x", "df_x", "n_docs", "avgdl", "dl", "score")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (tf, df, n, a, dl, score) =>
      val want: Long =
        if (tf <= 0) 0L
        else {
          val idf = ((BigInt(2) * 1000000 * (2 * BigInt(n) - 2 * df + 1)
            + (2 * BigInt(df) + 1)) / (2 * (2 * BigInt(df) + 1)))
            .min(BigInt(4000000000000L))
          val tfc = BigInt(math.min(tf, 1000000L))
          val sat = (BigInt(1000000) * 22 * tfc * a) /
            (BigInt(10) * tfc * a + 3 * BigInt(a) + 9 * BigInt(dl))
          (idf * sat / 1000000).toLong
        }
      assert(score == want,
        s"bm25(tf=$tf df=$df n=$n avgdl=$a dl=$dl): got=$score want=$want")
    }
  }

  test("avgdl derivation caps at 10^4 on long-document corpora and holds int64 to exabyte token counts") {
    import spark.implicits._
    // (len_total, n_docs): the cap must bite whenever L/N > 10^4 — a
    // book/code corpus whose AVERAGE document is long — because the
    // per-row sat bound 10^6·22·tf_c·avgdl < 2^63 is proven only for
    // avgdl ≤ 10^4; and 2·L + N must not wrap at the documented
    // L ≈ 4.6·10^18 headroom edge
    val cases = Seq(
      (70L, 9L),                           // half-up mean below the cap
      (99995000L, 10000L),                 // mean 9999.5 rounds UP to the cap value
      (100005000L, 10000L),                // mean 10000.5 -> 10001: cap bites
      (2000000000000L, 1000L),             // 2e9-token average docs -> cap
      (4600000000000000000L, 1000000000L)) // 2L+N at the int64 edge
      .toDF("len_total", "n_docs")
    val got = cases
      .withColumn("avgdl", expr(TextAnalysis.avgdlSql))
      .select("len_total", "n_docs", "avgdl")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (l, n, a) =>
      val want = ((2 * BigInt(l) + n) / (2 * BigInt(n))).min(10000).toLong
      assert(a == want, s"avgdl(L=$l, N=$n): got=$a want=$want")
    }
    assert(got.count(_._3 == 10000L) == 4, "cap regime not exercised")
  }

  test("decimal(19,0) squares sum exactly past the int64 wrap (diversity/burstiness shape)") {
    import spark.implicits._
    // two counts of 3e12: c*c = 9e24 each — far past 2^63 ≈ 9.2e18
    val c = 3000000000000L
    val sum = Seq(c, c).toDF("c")
      .agg(org.apache.spark.sql.functions.sum(
        col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
        .as("sc2"))
      .select(col("sc2").cast("string")).as[String].head()
    val want = (BigInt(c) * c * 2).toString
    assert(sum == want, s"sum(c^2): got=$sum want=$want")
  }

  test("per-factor double products are the correctly rounded true product below 2^53 (DSIR identity)") {
    // fl(a)·fl(b) == fl(a·b) when a and b are exactly representable:
    // the property that makes the engine's double-staged ratio equal
    // DuckDB's HUGEINT-then-double evaluation bit-for-bit
    val rnd = new scala.util.Random(14)
    (1 to 1000).foreach { _ =>
      val a = math.abs(rnd.nextLong()) % (1L << 52) + 1
      val b = math.abs(rnd.nextLong()) % (1L << 52) + 1
      assert(a.toDouble * b.toDouble == (BigInt(a) * BigInt(b)).toDouble,
        s"double product drifts for $a * $b")
    }
  }
}
