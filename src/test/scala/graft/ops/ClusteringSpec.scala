package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

class ClusteringSpec extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"

  test("kmeans: clusters partition the corpus and are deterministic") {
    val spark = TestSpark.spark
    val rows = Clustering.kmeans(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val n = graft.Tables.embeddings(spark, d).count()
    assert(rows.map(_._2).sum == n, "every vector lands in exactly one cluster")
    assert(rows.length > 1 && rows.length <= 8)
    // re-running the full iterative job must give bit-identical output —
    // the property the exact-integer arithmetic buys
    val again = Clustering.kmeans(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
  }

  test("kmeans iterations do not increase within-cluster integer cost") {
    // Lloyd's invariant: reassignment to the nearest centroid never
    // increases the total squared distance to the centroids it assigns
    // against. Verified on the engine's own exact integers: assignment
    // cost under the final centroids <= cost under the seed centroids.
    val spark = TestSpark.spark
    import spark.implicits._
    val vecs = graft.Tables.embeddings(spark, d)
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("m"))
      .as[Seq[Long]].collect()
    def cost(cents: Seq[Seq[Long]]): BigInt =
      vecs.map { v =>
        cents.map(c => BigInt(v.zip(c).map { case (a, b) =>
          (a - b) * (a - b)
        }.sum)).min
      }.sum
    val seed = vecs.take(8).map(_.toSeq).toSeq
    // final centroids are not exposed; approximate with the invariant
    // that one Lloyd update from the seed cannot raise the cost
    val assigned = vecs.map { v =>
      seed.zipWithIndex.minBy { case (c, i) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }._2
    }
    val updated = seed.indices.map { k =>
      val members = vecs.zip(assigned).filter(_._2 == k).map(_._1)
      if (members.isEmpty) seed(k)
      else members.head.indices.map { dim =>
        BigDecimal(members.map(_(dim)).sum.toDouble / members.size)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    assert(cost(updated) <= cost(seed),
      "a Lloyd centroid update must not increase the assignment cost")
  }

  test("int8 rescore agrees with brute force on the top result") {
    val spark = TestSpark.spark
    val got = Clustering.knnInt8(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 5)
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.reverse.toSeq)
    val brute = Similarity.knnBrute(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // the quantized candidate phase keeps 32 of ~1000; the exact top-1
    // must survive it on this corpus
    assert(got.head == brute.head,
      s"int8 top-1 ${got.head} != exact top-1 ${brute.head}")
  }

  test("pq rescore agrees with brute force on the top result") {
    val spark = TestSpark.spark
    val got = Clustering.knnPq(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 5)
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.reverse.toSeq)
    val brute = Similarity.knnBrute(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // ADC keeps 32 of ~500 candidates from 8-dim sub-distances; the
    // exact top-1 must survive the coarse phase on this corpus
    assert(got.head == brute.head,
      s"pq top-1 ${got.head} != exact top-1 ${brute.head}")
  }

  test("ivf-pq rescore agrees with brute force on the top result") {
    val spark = TestSpark.spark
    val got = Clustering.knnIvfPq(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 5)
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.reverse.toSeq)
    val brute = Similarity.knnBrute(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // two probed cells cover 2/16 of the corpus and residual-ADC keeps
    // 32 candidates; the exact top-1 must survive both phases here
    assert(got.head == brute.head,
      s"ivf-pq top-1 ${got.head} != exact top-1 ${brute.head}")
    // and the composed index must not trail plain PQ on this corpus:
    // same rescore budget, tighter candidate funnel
    val pq = Clustering.knnPq(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val bruteSet = brute.map(_._1).toSet
    assert(got.count(g => bruteSet(g._1)) >= pq.count(p => bruteSet(p._1)),
      "residual IVF-PQ must not lose top-5 overlap vs raw-vector PQ")
  }

  test("second IVF probe never loses recall (probe-set monotonicity)") {
    val spark = TestSpark.spark
    // a truth member found by the single probe survives any candidate
    // superset: at most 4 candidates anywhere outrank a global-top-5
    // row, so it stays in the probe top-5 when cells are added
    val r1 = Similarity.knnRecall(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = Similarity.knnRecallMultiProbe(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.keySet == r2.keySet)
    r1.foreach { case (q, h) =>
      assert(r2(q) >= h, s"qid=$q single=$h multi=${r2(q)}") }
  }

  test("knn recall audit equals the naive two-scan formulation") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.expressions.Window
    val got = Similarity.knnRecall(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == (0L until 10L).toSet)
    // naive twin: score twice, rank each side separately, intersect —
    // the formulation the salted single-pass plan must reproduce
    val e = graft.Tables.embeddings(spark, d)
    val dot = graft.functions.DotExpr.dot _
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("le"))
    // nearest of the 16 coarse centroids, argmin via min-of-struct
    val cents = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("le").as("ce"))
    val cell = v.crossJoin(broadcast(cents))
      .withColumn("d2", dot(col("le"), col("le"))
        - lit(2.0) * dot(col("le"), col("ce"))
        + dot(col("ce"), col("ce")))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("b"),
        first(col("le")).as("le"))
      .select(col("vec_id"), col("b.cid").as("cell"), col("le"))
    val q = cell.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("cell").as("qcell"),
        col("le").as("qe"))
    val corpus = cell.filter(col("vec_id") >= 10)
    val scored = corpus.crossJoin(broadcast(q))
      .select(col("qid"), col("qcell"), col("cell"), col("vec_id"),
        cos(col("le"), col("qe")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    def topk(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = topk(scored)
    val probe = topk(scored.filter(col("cell") === col("qcell")))
    (0L until 10L).foreach { qid =>
      val hits = (truth & probe).count(_._1 == qid).toLong
      assert(got(qid) == ((hits, 1000000L * hits / 5L)),
        s"qid=$qid got=${got(qid)} want hits=$hits")
    }
  }

  test("pcaPower recovers a planted dominant axis and is deterministic") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 200 synthetic vectors: dim 7 carries +-0.9, every other dim is
    // small deterministic noise — the second moment is dominated by
    // axis 7, so the top loading must land there with the largest |v|
    val planted = (0 until 200).map { r =>
      val v = Array.tabulate(64) { i =>
        if (i == 7) (if (r % 2 == 0) 0.9f else -0.9f)
        else (((r * 31 + i * 17) % 13) - 6) / 100.0f
      }
      (r.toLong, v.toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    planted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Clustering.pcaPower(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(out.length == 64)
    val byAbs = out.sortBy { case (_, l) => -math.abs(l) }
    assert(byAbs.head._1 == 7,
      s"dominant loading not on the planted axis: ${byAbs.take(3).toSeq}")
    assert(math.abs(byAbs.head._2) > 2 * math.abs(byAbs(1)._2),
      "planted axis should dominate clearly")
    val again = Clustering.pcaPower(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == again.toSeq, "power iteration must be bit-stable")
  }

  test("pcaPower one-pass Gram equals the naive explode formulation") {
    val spark = TestSpark.spark
    // the UDAF path is the scale design; pin its arithmetic against an
    // independent in-memory Gram over the same quantized vectors
    val vecs = graft.Tables.embeddings(spark, d)
      .select(expr("transform(embedding, x -> bigint(round(x * 1e6)))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vecs.length.toLong
    val gp = Array.ofDim[Long](64 * 64)
    vecs.foreach { v =>
      var i = 0
      while (i < 64) { var j = 0; while (j < 64) {
        gp(i * 64 + j) += v(i) * v(j); j += 1 }; i += 1 }
    }
    var v = Array.fill(64)(1000L)
    val gq = gp.map(_ / n)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(64) { i =>
        (0 until 64).map(j => gq(i * 64 + j) * v(j)).sum }
      val dvv = w.map(math.abs).max / 1000L + 1L
      v = w.map(_ / dvv)
    }
    val got = Clustering.pcaPower(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).map(_._2)
    assert(got.toSeq == v.toSeq, "distributed Gram diverged from reference")
  }
}
