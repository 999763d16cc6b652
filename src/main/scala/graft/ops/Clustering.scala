package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.Tables._

/** Embedding clustering and quantization — the two workhorses of
  * vector-corpus organization at 100 TB: Lloyd's k-means (the trainer
  * behind every IVF coarse quantizer) and int8 scalar quantization
  * (4x less scan bandwidth for candidate generation, exact rescore on
  * the survivors).
  *
  * Everything is EXACT integer arithmetic: embeddings are quantized to
  * micro-units (round(x * 1e6) as BIGINT), so distances are integer
  * sums — order-independent, bit-identical in any engine — and the
  * oracle can replay the whole iteration in SQL. The only division is
  * the centroid mean, one correctly-rounded double op per (cluster,
  * dim), identical under IEEE 754 everywhere.
  */
object Clustering {

  private val k = 8
  private val iters = 2
  private val dims = 64

  /** embedding (float) → micro-unit BIGINT vector. float→double is
    * exact; round() half-up matches DuckDB's round-half-away for the
    * magnitudes here. Shared with Similarity's trained dedup quantizer
    * (same exactness argument).
    */
  private[ops] def microVec(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1e6).cast("long"))

  /** Squared L2 distance over two long vectors — values ≤ 1.2e6 per
    * dim, so the per-dim square ≤ 1.5e12 and the 64-dim sum ≤ 1e14:
    * exact in BIGINT, no floating point at all. The native expression
    * (tight codegen loop) replaces the interpreted lambda fold in the
    * hottest loops the engine has — k-means assignment and PQ encode.
    */
  private def dist2(a: Column, b: Column): Column =
    graft.functions.LongVecExprs.sqDist(a, b)

  /** Lloyd's k-means over the embedding corpus: k=8, centroids seeded
    * from the first k vectors, `iters` centroid updates, then a final
    * assignment. Output: per-cluster member count and the exact sum of
    * the final centroid's components (an integer fingerprint of the
    * centroid itself).
    *
    * Scale shape: each iteration is ONE narrow pass (argmin over k
    * broadcast centroids — a literal array, no join) plus ONE
    * aggregation keyed by (cluster, dim) with map-side combine. The
    * centroid table (k x dims longs = 4 KB) is the only thing that
    * ever reaches the driver — the canonical k-means collect, bounded
    * by k, never by the corpus.
    */
  def kmeans(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
      .select(col("vec_id"), microVec(col("embedding")).as("m"))
    vecs.cache()
    try {
      // seed: the first k vectors (deterministic; a k-means++ seeder
      // would slot in identically)
      var centroids: Seq[(Int, Seq[Long])] = vecs.filter(col("vec_id") < k)
        .collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Long](1)))
        .sortBy(_._1).toSeq
      // fail loudly rather than silently run k' < k clusters: the seed
      // rule (and the oracle) assume vec_ids 0..k-1 exist exactly once
      require(centroids.map(_._1) == (0 until k),
        s"kmeans seed expects distinct vec_ids 0..${k - 1}, " +
          s"got ${centroids.map(_._1)}")

      def assigned: DataFrame = {
        // argmin over k literal centroids: array_min on (d2, cid)
        // structs — lexicographic struct order gives the tie-break on
        // cid for free
        val best = array_min(array(centroids.map { case (cid, c) =>
          struct(dist2(col("m"), typedLit(c)).as("d2"),
            lit(cid).as("cid"))
        }: _*))
        vecs.withColumn("cluster", best.getField("cid"))
      }

      for (_ <- 1 to iters) {
        // new centroid = per-dim rounded mean of members, computed as
        // one (cluster, dim)-keyed aggregation; k x dims rows collect
        val sums = assigned
          .select(col("cluster"), posexplode(col("m")).as(Seq("dim", "v")))
          .groupBy("cluster", "dim")
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
          .collect()
          // HALF_UP (ties away from zero) — math.round would break ties
          // toward +inf and diverge from SQL round() on negative means
          .map(r => (r.getInt(0), r.getInt(1),
            BigDecimal(r.getLong(2).toDouble / r.getLong(3))
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
        centroids = sums.groupBy(_._1).toSeq.map { case (cid, rows) =>
          (cid, rows.sortBy(_._2).map(_._3).toSeq)
        }.sortBy(_._1)
      }

      val counts = assigned.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
      val sigs = s.createDataFrame(centroids.map { case (cid, c) =>
        (cid, c.sum)
      }).toDF("cluster", "centroid_sum")
      counts.join(broadcast(sigs), "cluster")
        .select(col("cluster").cast("long").as("cluster"),
          col("n_members"), col("centroid_sum"))
    } finally vecs.unpersist()
  }

  /** Int8 scalar quantization + two-phase ANN: each vector is encoded
    * as 64 signed bytes plus one per-vector scale (max |x|); candidate
    * generation ranks by the quantized estimate (integer dot x the two
    * scales), the top-32 survivors are rescored with the exact cosine,
    * and the exact top-5 is returned.
    *
    * Why it matters at 100 TB: the candidate scan reads 64 B + 8 B per
    * vector instead of 512 B of doubles — a 4-8x memory-bandwidth cut
    * on the phase that touches EVERY vector — while the exact math only
    * runs on 32 rows. Quantized and exact scores use in-order folds, so
    * both phases are deterministic and the oracle replays them.
    */
  def knnInt8(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("le"))
    // per-vector scale and int8 codes; scale > 0 (all-zero vectors get
    // scale 1 so the code is well-defined)
    val enc = e
      .withColumn("scale",
        greatest(array_max(transform(col("le"), x => abs(x))), lit(1e-30)))
      .withColumn("q",
        transform(col("le"), x => round(x * 127.0 / col("scale"))
          .cast("long")))
    val q = enc.filter(col("vec_id") === 0)
      .select(col("q").as("qq"), col("scale").as("qscale"),
        col("le").as("qe"))
    val dotInt = graft.functions.LongVecExprs.dotLong(col("q"), col("qq"))
    val dotExact = graft.functions.DotExpr.dot(col("le"), col("qe"))
    val norm = (c: Column) => sqrt(graft.functions.DotExpr.dot(c, c))
    enc.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      // quantized estimate: integer dot rescaled by the two max-abs
      // scales — one double multiply chain, deterministic
      .select(col("vec_id"), col("le"), col("qe"),
        (dotInt.cast("double") * col("scale") * col("qscale")
          / (127.0 * 127.0)).as("est"))
      .orderBy(col("est").desc, col("vec_id"))
      .limit(32)
      .select(col("vec_id"),
        round(dotExact / (norm(col("le")) * norm(col("qe"))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  private val nSub = 8
  private val subDim = 8

  /** Product-quantization ANN — the codebook counterpart to the int8
    * scalar path: the 64-dim space splits into 8 subspaces of 8 dims,
    * each sub-vector is encoded as the id of its nearest codeword
    * (codebook = sub-vectors of the first 16 embeddings; a trained
    * codebook slots in identically), and query distance is estimated
    * by ADC — one 8x16 lookup table built from the query, then a sum
    * of 8 table entries per corpus vector. At 100 TB the candidate
    * scan reads 8 SMALL code ids per vector (vs 64 floats), and the
    * LUT join is a broadcast of 128 rows; the exact cosine runs only
    * on the 32 survivors. All quantized arithmetic is micro-unit
    * BIGINT — distances are exact integers, so candidate ranking is
    * bit-identical in any engine.
    */
  def knnPq(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      microVec(col("embedding")).as("m"),
      transform(col("embedding"), x => x.cast("double")).as("le"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cid"), col("m").as("cm"))
    def sub(c: Column, j: Int) = slice(c, j * subDim + 1, subDim)
    // encode: per-subspace argmin over the broadcast codebook, all 8
    // subspaces in one pass (argmin via min-of-struct, cid tie-break)
    val subAggs = (0 until nSub).map { j =>
      min(struct(dist2(sub(col("m"), j), sub(col("cm"), j)).as("d"),
        col("cid").as("cid"))).as(s"c$j")
    }
    val codes = e.select(col("vec_id"), col("m"))
      .crossJoin(broadcast(cents))
      .groupBy("vec_id")
      .agg(subAggs.head, subAggs.tail: _*)
      .select(col("vec_id"), posexplode(
        array((0 until nSub).map(j => col(s"c$j.cid")): _*))
        .as(Seq("j", "code")))
    val q = e.filter(col("vec_id") === 0)
      .select(col("m").as("qm"), col("le").as("qe"))
    // ADC lookup table: query sub-vector -> every codeword, 8x16 rows
    val lut = cents.crossJoin(broadcast(q))
      .select(col("cid").as("code"), posexplode(
        array((0 until nSub).map(j =>
          dist2(sub(col("cm"), j), sub(col("qm"), j))): _*))
        .as(Seq("j", "l")))
      .select(col("j"), col("code"), col("l"))
    val dotD = (a: Column, b: Column) => graft.functions.DotExpr.dot(a, b)
    codes.join(broadcast(lut), Seq("j", "code"))
      .groupBy("vec_id")
      .agg(sum(col("l")).as("est"))
      .filter(col("vec_id") =!= 0)
      .orderBy(col("est"), col("vec_id"))
      .limit(32)
      .join(e.select(col("vec_id"), col("le")), "vec_id")
      .crossJoin(broadcast(q.select(col("qe"))))
      .select(col("vec_id"),
        round(dotD(col("le"), col("qe")) /
          (sqrt(dotD(col("le"), col("le"))) *
            sqrt(dotD(col("qe"), col("qe")))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** IVF-PQ — the composition the two index halves exist for, and the
    * canonical 100 TB ANN layout: a coarse quantizer routes each
    * vector to an inverted list (IVF, 16 first-k cells), and the
    * vector's RESIDUAL against its cell centroid is product-quantized
    * (8 subspaces × 16 codewords, codebook = the first 16 residuals).
    * Residual encoding is what makes the composition better than
    * either half: within a cell the residual magnitudes are small, so
    * the same codebook budget spends its resolution where the cell's
    * vectors actually differ.
    *
    * Query path: probe the TWO nearest cells (the IVF nprobe knob),
    * build one 8×16 ADC lookup table PER PROBED CELL from the query's
    * residual against THAT cell's centroid, estimate distances for
    * in-cell codes by summing 8 table entries, take the top-32
    * candidates, and rescore them with the exact cosine. At 100 TB:
    * the candidate scan touches 2/16 of the corpus and reads 8 small
    * code ids per vector; the codebook, probe set, and LUT are
    * broadcast-sized by construction; the exact math runs on 32 rows.
    *
    * Every quantized quantity is micro-unit BIGINT arithmetic —
    * assignments, residuals, and ADC sums are exact integers (residual
    * components ≤ ~2.4e6, squared-sum terms ≪ 2^53), so the candidate
    * ranking is bit-identical in any engine and the DuckDB oracle
    * replays the whole index build.
    */
  def knnIvfPq(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      microVec(col("embedding")).as("m"),
      transform(col("embedding"), x => x.cast("double")).as("le"))
    val coarse = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("ccid"), col("m").as("ccm"))
    // coarse assignment carries the winning centroid in the argmin
    // struct so the residual is one zip_with away (no join-back); the
    // array field only ever tie-breaks after (d2, ccid), i.e. never
    val asg = e.crossJoin(broadcast(coarse))
      .groupBy(col("vec_id"))
      .agg(min(struct(dist2(col("m"), col("ccm")).as("d"),
          col("ccid").as("cell"), col("ccm").as("cm"))).as("b"),
        first(col("m")).as("m"), first(col("le")).as("le"))
      .select(col("vec_id"), col("b.cell").as("cell"),
        zip_with(col("m"), col("b.cm"), (x, c) => x - c).as("r"),
        col("le"))
    // PQ codebook on residuals: the first 16 vectors' residuals (a
    // trained per-subspace codebook slots in identically)
    val book = asg.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("code"), col("r").as("cr"))
    def sub(c: Column, j: Int) = slice(c, j * subDim + 1, subDim)
    val subAggs = (0 until nSub).map { j =>
      min(struct(dist2(sub(col("r"), j), sub(col("cr"), j)).as("d"),
        col("code").as("code"))).as(s"c$j")
    }
    val codes = asg.select(col("vec_id"), col("cell"), col("r"))
      .crossJoin(broadcast(book))
      .groupBy(col("vec_id"))
      .agg(first(col("cell")).as("cell"), subAggs: _*)
      .select(col("vec_id"), col("cell"), posexplode(
        array((0 until nSub).map(j => col(s"c$j.code")): _*))
        .as(Seq("j", "code")))
    // query probes: its TWO nearest coarse cells, with the residual
    // against EACH probed centroid (the LUT is per probed cell)
    val qProbes = e.filter(col("vec_id") === 0)
      .crossJoin(broadcast(coarse))
      .select(col("ccid").as("qcell"),
        dist2(col("m"), col("ccm")).as("qd"),
        zip_with(col("m"), col("ccm"), (x, c) => x - c).as("qr"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("qd"), col("qcell"))))
      .filter(col("rn") <= 2)
      .select(col("qcell"), col("qr"))
    // ADC lookup table: (probed cell, subspace, codeword) → partial d²
    val lut = book.crossJoin(broadcast(qProbes))
      .select(col("qcell"), col("code"), posexplode(
        array((0 until nSub).map(j =>
          dist2(sub(col("cr"), j), sub(col("qr"), j))): _*))
        .as(Seq("j", "l")))
      .select(col("qcell"), col("j"), col("code"), col("l"))
    val dotD = (a: Column, b: Column) => graft.functions.DotExpr.dot(a, b)
    val q = e.filter(col("vec_id") === 0).select(col("le").as("qe"))
    codes.filter(col("vec_id") =!= 0)
      .join(broadcast(lut),
        col("cell") === col("qcell") && codes("j") === lut("j")
          && codes("code") === lut("code"))
      .groupBy(col("vec_id"))
      .agg(sum(col("l")).as("est"))
      .orderBy(col("est"), col("vec_id"))
      .limit(32)
      .join(e.select(col("vec_id"), col("le")), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotD(col("le"), col("qe")) /
          (sqrt(dotD(col("le"), col("le"))) *
            sqrt(dotD(col("qe"), col("qe")))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** Class-conditional embedding statistics over the labeled corpus:
    * per label, member count plus exact integer fingerprints of the
    * class centroid (component sum) and the second moment (norm²
    * sum) — the dataset-QA pass that catches collapsed or mislabeled
    * embedding classes before training. ONE map-side-combinable
    * aggregation; all sums are exact BIGINTs over micro-unit vectors.
    */
  def labelStats(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        microVec(col("embedding")).as("m"))
      .select(col("label"),
        aggregate(col("m"), lit(0L), (a, x) => a + x).as("csum"),
        aggregate(col("m"), lit(0L), (a, x) => a + x * x).as("n2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("csum")).as("comp_sum"),
        sum(col("n2")).as("norm2_sum"))

  /** Embedding-corpus audit — the sanity pass before any vector work:
    * dimension consistency (a ragged corpus breaks every dot product),
    * zero-vector count (cosine is undefined on them), and the exact
    * norm² range in micro-units. ONE narrow scan + a 1-row aggregate.
    */
  def embeddingAudit(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(size(col("embedding")).cast("long").as("dims"),
        aggregate(microVec(col("embedding")), lit(0L),
          (a, x) => a + x * x).as("n2"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("dims")).as("dims_min"), max(col("dims")).as("dims_max"),
        sum(when(col("n2") === 0L, 1L).otherwise(0L)).as("n_zero"),
        min(col("n2")).as("norm2_min"), max(col("n2")).as("norm2_max"))

  /** Exact-integer PCA: the dominant principal direction of the
    * embedding corpus via power iteration on the (uncentered) second-
    * moment Gram matrix — the standard corpus-health probe ("is there
    * one axis eating all the variance?") and the first step of
    * whitening/OPQ-style rotations.
    *
    * Scale shape — the part that matters at 100 TB: the Gram matrix is
    * accumulated in ONE distributed pass with a partial-aggregating
    * UDAF (a d*d long buffer per task, merge = vector add), so the
    * shuffle carries one 32 KB row per partition, NOT the d*d-per-row
    * explode a naive groupBy(i, j) would fan out (64x the corpus). The
    * only driver work is the d*d collect (fixed by the schema, never
    * by the corpus — the same bound as the k-means centroid collect)
    * and three 64x64 integer mat-vecs.
    *
    * Exactness: all arithmetic is int64 with magnitudes proven small —
    * Gram entries <= N * 1e12 (micro^2), the per-row normalization
    * `gij div N` caps them at 1e12 independent of N, iterates stay
    * <= 1e3, so mat-vec sums stay <= 64 * 1e15. Division is
    * truncation toward zero in BOTH engines (Scala `/`, DuckDB `//` —
    * verified on negatives), so the oracle replays every iteration
    * bit-for-bit. The all-ones start and fixed 3 iterations make the
    * sign and scale of the output deterministic.
    */
  def pcaPower(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
      .select(microVec(col("embedding")).as("m"))
    val gram = udaf(GramAgg, ExpressionEncoder[Seq[Long]]())
    val row = vecs.agg(gram(col("m")).as("g"), count(lit(1)).as("n"))
      .head()
    val g = row.getSeq[Long](0)
    val n = row.getLong(1)
    require(n > 0, "pcaPower on an empty embeddings table")
    // per-entry scale-down: caps magnitudes for the iteration and makes
    // the Gram scale-invariant in N (gp is the mean outer product)
    val gp = g.map(_ / n).toArray
    var v = Array.fill(dims)(1000L)
    for (_ <- 1 to pcaIters) {
      val w = Array.tabulate(dims) { i =>
        var acc = 0L; var j = 0
        while (j < dims) { acc += gp(i * dims + j) * v(j); j += 1 }
        acc
      }
      val m = w.map(math.abs).max
      val div = m / 1000L + 1L
      v = w.map(_ / div)
    }
    import s.implicits._
    v.toSeq.zipWithIndex.map { case (l, i) => (i, l) }
      .toDF("dim", "loading")
  }

  /** One-pass Gram accumulation: buffer = flattened d x d int64 matrix,
    * reduce adds the row's outer product, merge adds buffers. Partial
    * aggregation makes this a single narrow scan at any scale.
    */
  private object GramAgg
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](dims * dims)
    def reduce(b: Array[Long], row: Seq[Long]): Array[Long] = {
      val v = row.toArray
      require(v.length == dims, s"expected $dims dims, got ${v.length}")
      var i = 0
      while (i < dims) {
        val vi = v(i); val base = i * dims; var j = 0
        while (j < dims) { b(base + j) += vi * v(j); j += 1 }
        i += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  private val pcaIters = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_kmeans" -> (kmeans _),
    "q_knn_int8" -> (knnInt8 _),
    "q_knn_pq" -> (knnPq _),
    "q_knn_ivfpq" -> (knnIvfPq _),
    "q_knn_label_stats" -> (labelStats _),
    "q_knn_audit" -> (embeddingAudit _),
    "q_knn_pca" -> (pcaPower _),
  )

  /** The k-means oracle replays both Lloyd iterations in SQL — exact
    * integer distances, the same rounded-mean update, the same
    * (d2, cid) tie-break.
    */
  private val microSql =
    "list_transform(embedding, x -> CAST(round(x::DOUBLE * 1e6) AS BIGINT))"

  /** d2 via three in-order integer inner products (exact in double at
    * these magnitudes): |a-b|^2 = a.a - 2 a.b + b.b.
    */
  private def d2Sql(a: String, b: String): String =
    s"(list_inner_product($a, $a) - 2 * list_inner_product($a, $b) + list_inner_product($b, $b))"

  private def assignSql(vecsRel: String, centsRel: String): String =
    s"""SELECT vec_id, m, cid AS cluster FROM (
       |  SELECT v.vec_id, v.m, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${d2Sql("v.m", "c.c")}, c.cid) AS rn
       |  FROM $vecsRel v, $centsRel c) t WHERE rn = 1""".stripMargin

  private val updateSql =
    """SELECT cluster AS cid, list(cv ORDER BY dim) AS c FROM (
      |  SELECT cluster, i AS dim,
      |    CAST(round(sum(m[i + 1])::DOUBLE / count(*)) AS BIGINT) AS cv
      |  FROM A, range(64) t(i)
      |  GROUP BY cluster, i) u GROUP BY cluster""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_knn_kmeans" ->
      s"""WITH vecs AS (SELECT vec_id, $microSql AS m FROM embeddings),
         |c0 AS (SELECT vec_id::INT AS cid, m AS c FROM vecs WHERE vec_id < $k),
         |a1 AS (${assignSql("vecs", "c0")}),
         |c1 AS (${updateSql.replace("FROM A", "FROM a1")}),
         |a2 AS (${assignSql("vecs", "c1")}),
         |c2 AS (${updateSql.replace("FROM A", "FROM a2")}),
         |a3 AS (${assignSql("vecs", "c2")}),
         |g AS (SELECT cluster, count(*) AS n_members FROM a3 GROUP BY cluster)
         |SELECT g.cluster::BIGINT AS cluster, g.n_members,
         |  list_sum(c.c)::BIGINT AS centroid_sum
         |FROM g JOIN c2 c ON c.cid = g.cluster""".stripMargin,
    "q_knn_audit" ->
      s"""WITH m AS (SELECT len(embedding)::BIGINT AS dims,
         |  CAST(list_inner_product($microSql, $microSql) AS BIGINT) AS n2
         |  FROM embeddings)
         |SELECT count(*) AS n_vecs,
         |  min(dims) AS dims_min, max(dims) AS dims_max,
         |  sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
         |  min(n2) AS norm2_min, max(n2) AS norm2_max
         |FROM m""".stripMargin,
    // replays the full power iteration: Gram via the d x d explode
    // (fine at oracle scale; Spark uses the one-pass UDAF instead),
    // then three unrolled mat-vec + truncating-renormalize rounds.
    // `//` truncates toward zero in DuckDB, matching Scala/Spark div.
    "q_knn_pca" ->
      s"""WITH vecs AS (SELECT $microSql AS m FROM embeddings),
         |n AS (SELECT count(*)::BIGINT AS c FROM vecs),
         |g AS (SELECT i, j, SUM(m[i + 1] * m[j + 1])::BIGINT AS gij
         |      FROM vecs, range(64) t1(i), range(64) t2(j)
         |      GROUP BY i, j),
         |gs AS (SELECT i, j, gij // n.c AS gp FROM g, n),
         |w1 AS (SELECT i, SUM(gp * 1000)::BIGINT AS w FROM gs GROUP BY i),
         |d1 AS (SELECT MAX(ABS(w)) // 1000 + 1 AS dv FROM w1),
         |v1 AS (SELECT i, w // dv AS v FROM w1, d1),
         |w2 AS (SELECT gs.i, SUM(gs.gp * v1.v)::BIGINT AS w
         |       FROM gs JOIN v1 ON v1.i = gs.j GROUP BY gs.i),
         |d2 AS (SELECT MAX(ABS(w)) // 1000 + 1 AS dv FROM w2),
         |v2 AS (SELECT i, w // dv AS v FROM w2, d2),
         |w3 AS (SELECT gs.i, SUM(gs.gp * v2.v)::BIGINT AS w
         |       FROM gs JOIN v2 ON v2.i = gs.j GROUP BY gs.i),
         |d3 AS (SELECT MAX(ABS(w)) // 1000 + 1 AS dv FROM w3),
         |v3 AS (SELECT i, w // dv AS v FROM w3, d3)
         |SELECT i::INT AS dim, v::BIGINT AS loading FROM v3""".stripMargin,
    "q_knn_label_stats" ->
      s"""WITH m AS (SELECT label::BIGINT AS label, $microSql AS m
         |           FROM embeddings),
         |per AS (
         |  SELECT label, list_sum(m)::BIGINT AS csum,
         |    CAST(list_inner_product(m, m) AS BIGINT) AS n2
         |  FROM m)
         |SELECT label, count(*) AS n_vecs, sum(csum)::BIGINT AS comp_sum,
         |  sum(n2)::BIGINT AS norm2_sum
         |FROM per GROUP BY label""".stripMargin,
    "q_knn_pq" ->
      s"""WITH v AS (
         |  SELECT vec_id, $microSql AS m,
         |    list_transform(embedding, x -> x::DOUBLE) AS le
         |  FROM embeddings),
         |cents AS (SELECT vec_id::INT AS cid, m AS cm FROM v WHERE vec_id < 16),
         |encd AS (
         |  SELECT v.vec_id, t.j, c.cid,
         |    ${d2Sql("list_slice(v.m, t.j*8+1, t.j*8+8)",
                      "list_slice(c.cm, t.j*8+1, t.j*8+8)")} AS dd
         |  FROM v, range(8) t(j), cents c),
         |codes AS (
         |  SELECT vec_id, j, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
         |      ORDER BY dd, cid) AS rn
         |    FROM encd) x WHERE rn = 1),
         |q AS (SELECT m AS qm, le AS qe FROM v WHERE vec_id = 0),
         |lut AS (
         |  SELECT t.j, c.cid AS code,
         |    ${d2Sql("list_slice(c.cm, t.j*8+1, t.j*8+8)",
                      "list_slice(q.qm, t.j*8+1, t.j*8+8)")} AS l
         |  FROM cents c, range(8) t(j), q),
         |est AS (
         |  SELECT codes.vec_id, sum(lut.l) AS est
         |  FROM codes JOIN lut USING (j, code) GROUP BY 1),
         |top32 AS (
         |  SELECT vec_id, est FROM est WHERE vec_id <> 0
         |  ORDER BY est, vec_id LIMIT 32)
         |SELECT t.vec_id,
         |  round(list_inner_product(v.le, q.qe) /
         |    (sqrt(list_inner_product(v.le, v.le)) *
         |     sqrt(list_inner_product(q.qe, q.qe))), 6) AS sim
         |FROM top32 t JOIN v ON v.vec_id = t.vec_id, q
         |ORDER BY sim DESC, t.vec_id LIMIT 5""".stripMargin,
    "q_knn_ivfpq" ->
      s"""WITH v AS (
         |  SELECT vec_id, $microSql AS m,
         |    list_transform(embedding, x -> x::DOUBLE) AS le
         |  FROM embeddings),
         |cc AS (SELECT vec_id::INT AS ccid, m AS ccm FROM v WHERE vec_id < 16),
         |asg AS (
         |  SELECT vec_id, cell, le,
         |    list_transform(range(1, 65), i -> m[i] - ccm[i]) AS r
         |  FROM (
         |    SELECT v.vec_id, v.m, v.le, c.ccid AS cell, c.ccm,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${d2Sql("v.m", "c.ccm")}, c.ccid) AS rn
         |    FROM v, cc c) t WHERE rn = 1),
         |book AS (SELECT vec_id::INT AS code, r AS cr FROM asg
         |         WHERE vec_id < 16),
         |encd AS (
         |  SELECT a.vec_id, a.cell, t.j, b.code,
         |    ${d2Sql("list_slice(a.r, t.j*8+1, t.j*8+8)",
                      "list_slice(b.cr, t.j*8+1, t.j*8+8)")} AS dd
         |  FROM asg a, range(8) t(j), book b),
         |codes AS (
         |  SELECT vec_id, cell, j, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
         |      ORDER BY dd, code) AS rn
         |    FROM encd) x WHERE rn = 1),
         |qp AS (
         |  SELECT ccid AS qcell,
         |    list_transform(range(1, 65), i -> m[i] - ccm[i]) AS qr
         |  FROM (
         |    SELECT v.m, c.ccid, c.ccm,
         |      row_number() OVER (
         |        ORDER BY ${d2Sql("v.m", "c.ccm")}, c.ccid) AS rn
         |    FROM v, cc c WHERE v.vec_id = 0) t WHERE rn <= 2),
         |lut AS (
         |  SELECT qp.qcell, t.j, b.code,
         |    ${d2Sql("list_slice(b.cr, t.j*8+1, t.j*8+8)",
                      "list_slice(qp.qr, t.j*8+1, t.j*8+8)")} AS l
         |  FROM book b, range(8) t(j), qp),
         |est AS (
         |  SELECT c.vec_id, sum(l.l) AS est
         |  FROM codes c JOIN lut l
         |    ON c.cell = l.qcell AND c.j = l.j AND c.code = l.code
         |  WHERE c.vec_id <> 0 GROUP BY 1),
         |top32 AS (SELECT vec_id, est FROM est ORDER BY est, vec_id LIMIT 32),
         |q AS (SELECT le AS qe FROM v WHERE vec_id = 0)
         |SELECT t.vec_id,
         |  round(list_inner_product(v.le, q.qe) /
         |    (sqrt(list_inner_product(v.le, v.le)) *
         |     sqrt(list_inner_product(q.qe, q.qe))), 6) AS sim
         |FROM top32 t JOIN v ON v.vec_id = t.vec_id, q
         |ORDER BY sim DESC, t.vec_id LIMIT 5""".stripMargin,
    "q_knn_int8" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS le
         |  FROM embeddings),
         |enc AS (
         |  SELECT vec_id, le,
         |    greatest(list_max(list_transform(le, x -> abs(x))), 1e-30)
         |      AS scale
         |  FROM v),
         |encq AS (
         |  SELECT vec_id, le, scale,
         |    list_transform(le, x -> CAST(round(x * 127.0 / scale) AS BIGINT))
         |      AS q
         |  FROM enc),
         |qv AS (SELECT q AS qq, scale AS qscale, le AS qe
         |       FROM encq WHERE vec_id = 0),
         |cand AS (
         |  SELECT e.vec_id, e.le, q.qe,
         |    list_inner_product(e.q, q.qq) * e.scale * q.qscale
         |      / (127.0 * 127.0) AS est
         |  FROM encq e, qv q WHERE e.vec_id <> 0
         |  ORDER BY est DESC, e.vec_id LIMIT 32)
         |SELECT vec_id, round(list_inner_product(le, qe) /
         |    (sqrt(list_inner_product(le, le)) * sqrt(list_inner_product(qe, qe))), 6)
         |  AS sim
         |FROM cand ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin,
  )
}
