package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sketch operators — the one-pass approximate structures a 100 TB
  * engine uses where exact answers need a sort or unbounded state:
  * fixed-width histogram quantiles, count-min frequency estimates, and
  * HyperLogLog distinct counts.
  *
  * Everything here is DETERMINISTIC and oracle-exact by construction —
  * the sketches use md5-derived hashes and integer register math
  * (powers of two as BIGINTs, not float sums), so the same estimate
  * comes out of any engine at any parallelism. That property is not
  * cosmetic: a sketch whose value depends on partition order cannot be
  * regression-tested, compared across runs, or merged incrementally
  * with confidence.
  */
object Sketches {

  /** Histogram-sketch quantiles: one pass builds a 1000-bucket
    * fixed-width histogram of the event values; p50/p99 are read from
    * the cumulative counts (bucket lower edge). The scalable
    * alternative to exact `percentile` — which must see all values per
    * group — at the cost of a bounded bucket-width error. Threshold
    * tests are integer (`cum·100 ≥ q·N`), so bucket selection cannot
    * drift across engines.
    */
  def histQuantiles(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("value"))
    val bounds = ev.agg(min(col("value")).as("vmin"),
      max(col("value")).as("vmax"), count(lit(1)).as("n_total"))
    val b = ev.join(broadcast(bounds))
      .select(least(floor(lit(1000.0) * (col("value") - col("vmin"))
        / (col("vmax") - col("vmin"))).cast("long"), lit(999L)).as("bucket"),
        col("vmin"), col("vmax"), col("n_total"))
      .groupBy("bucket", "vmin", "vmax", "n_total")
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = b.withColumn("cum", sum(col("cnt")).over(w))
    def edge(q: Int) = round(col("vmin") + col("bucket")
      * (col("vmax") - col("vmin")) / 1000.0, 6)
    val p50 = cum.filter(col("cum") * 100 >= lit(50) * col("n_total"))
      .orderBy("bucket").limit(1).select(edge(50).as("p50_est"))
    val p99 = cum.filter(col("cum") * 100 >= lit(99) * col("n_total"))
      .orderBy("bucket").limit(1).select(edge(99).as("p99_est"))
    p50.crossJoin(p99)
  }

  private val cmsDepth = 4
  private val cmsWidth = 256

  /** Count-min frequency estimation for the 20 most frequent terms:
    * token occurrences hash into a 4×256 cell grid (md5 rows), the
    * estimate is the min over the 4 row cells — always ≥ the exact
    * count, overcounting only on collisions. The grid is a constant
    * 1 KB of state regardless of vocabulary size — the point of the
    * sketch — and the exact counts ride along to expose the error.
    */
  def cmsTopTerms(s: SparkSession, d: String): DataFrame = {
    val occ = documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(explode(Dedup.tokens(col("text"))).as("term"))
    def cell(j: Int) = expr(
      s"CAST(conv(substring(md5(concat('${j}_', term)), 1, 4), 16, 10) AS BIGINT) % $cmsWidth")
    // Aggregate to the VOCABULARY first (guide §2.3 — aggregate before
    // you shuffle, and before you hash): every downstream consumer
    // needs only (term, n). The previous shape ran tokenize + explode
    // + per-OCCURRENCE md5 once for the top-20 and once per sketch row
    // — 5 full passes over the occurrence stream, 47 CPU-seconds at
    // sf0.1 (the fleet's most CPU-expensive query). Summing n per cell
    // over distinct terms is identical arithmetic to counting
    // occurrences per cell (Σ_term∈cell n_term ≡ |occurrences∈cell|),
    // so the sketch is bit-identical; the md5 grid now runs over the
    // vocab (|V| rows), not the corpus (|occ| rows), and the single
    // occurrence-level aggregation below each sketch row is one shared
    // exchange (ReuseExchange dedups the identical subtree). At 100 TB
    // this is the difference between 5 corpus passes and 1.
    // materialize the vocab ONCE (round 20): AQE's stage reuse shares
    // the shuffle DATA across the five consumers, but each consumer
    // still re-runs the reduce-side final aggregation over the shared
    // occurrence shuffle (measured: five 0.16-0.37 s broadcast jobs,
    // 18.5 executor-CPU-s at 0.95 s wall). The eager checkpoint runs
    // the corpus pass + final agg exactly once by construction; the
    // five consumers then read a |V|-row in-memory frame. Per-execution
    // frame, never re-read after the caller's action — safe for
    // Bench.dropUnpinned to drop (the etlInitialLoad precedent).
    val termCounts = occ.groupBy("term").agg(count(lit(1)).as("exact_n"))
      .localCheckpoint(true)
    val top = termCounts
      .orderBy(col("exact_n").desc, col("term")).limit(20)
    val withCells = top.select(col("term") +: col("exact_n") +:
      (0 until cmsDepth).map(j => cell(j).as(s"cell$j")): _*)
    val est = (0 until cmsDepth).foldLeft(withCells) { (df, j) =>
      df.join(broadcast(termCounts.groupBy(cell(j).as(s"cell$j"))
          .agg(sum(col("exact_n")).as(s"est$j"))),
        Seq(s"cell$j"))
    }
    est.select(col("term"), col("exact_n"),
      least((0 until cmsDepth).map(j => col(s"est$j")): _*).as("cms_est"))
      .orderBy(col("exact_n").desc, col("term"))
  }

  /** HyperLogLog distinct-user estimate with 256 registers — and the
    * register math kept EXACT: each register contributes
    * 2^(53 − M[j]) as a BIGINT (the float form Σ2^−M is partition-
    * order-sensitive in its low bits; scaling by 2^53 makes the sum an
    * exact integer), so the harmonic mean — and therefore the
    * estimate — is bit-identical in any engine. One double division at
    * the end; exact distinct count alongside for the error.
    */
  def hllUsers(s: SparkSession, d: String): DataFrame = {
    val m = 256
    val hashed = events(s, d)
      .select(expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
    val regs = hashed
      .select(pmod(col("h"), lit(m.toLong)).as("reg"),
        expr(s"h DIV $m").as("rest"))
      // rank = leading-zero count of the 52-bit remainder + 1
      //      = 53 − bit_length(rest); bin() gives exact bit length
      .select(col("reg"),
        when(col("rest") === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(col("rest")))).as("rank"))
      .groupBy("reg").agg(max(col("rank")).as("mj"))
      .agg(count(lit(1)).as("m_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mj AS INT))"))
          .as("sum_pow"))
    val alpha = 0.7182725932857715 // alpha_256 = 0.7213/(1+1.079/256)
    val exact = events(s, d).agg(countDistinct(col("user_id")).as("exact_n"))
    regs.crossJoin(broadcast(exact))
      .select(col("exact_n"),
        round(lit(alpha * m * m) * lit(9007199254740992.0) // 2^53
          / (col("sum_pow") + (lit(m.toLong) - col("m_present"))
            * lit(9007199254740992L)).cast("double"), 6).as("hll_est"))
  }

  /** HLL MERGEABILITY — the property that makes sketches the right
    * structure at 100 TB: per-stream register vectors combine by
    * register-wise max into exactly the sketch a single pass over the
    * union would build. Here: one register set per event stream,
    * merged across the 'click' and 'purchase' streams, against the
    * exact union distinct. Same exact-integer register math as
    * `hllUsers`, plus one groupBy(reg) max as the merge.
    */
  def hllMerge(s: SparkSession, d: String): DataFrame = {
    val m = 256
    val types = Seq("click", "purchase")
    val regs = events(s, d)
      .filter(col("event_type").isin(types: _*))
      .select(col("event_type"), expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
      .select(col("event_type"), pmod(col("h"), lit(m.toLong)).as("reg"),
        expr(s"h DIV $m").as("rest"))
      .select(col("event_type"), col("reg"),
        when(col("rest") === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(col("rest")))).as("rank"))
      .groupBy("event_type", "reg").agg(max(col("rank")).as("mj"))
    // merge = register-wise max across the per-stream sketches
    val merged = regs.groupBy("reg").agg(max(col("mj")).as("mj"))
      .agg(count(lit(1)).as("m_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mj AS INT))"))
          .as("sum_pow"))
    val alpha = 0.7182725932857715
    val exact = events(s, d).filter(col("event_type").isin(types: _*))
      .agg(countDistinct(col("user_id")).as("exact_union"))
    merged.crossJoin(broadcast(exact))
      .select(col("exact_union"),
        round(lit(alpha * m * m) * lit(9007199254740992.0)
          / (col("sum_pow") + (lit(m.toLong) - col("m_present"))
            * lit(9007199254740992L)).cast("double"), 6).as("hll_union_est"))
  }

  private val kmvK = 64
  // (k-1) * 2^40 — the KMV estimator numerator for 40-bit hashes
  private val kmvNum = (kmvK - 1).toLong * (1L << 40)

  /** KMV (k-minimum-values) distinct sketch per event stream: the k
    * smallest 40-bit hashes of the stream's user ids. Where HLL only
    * merges by union, KMV also answers SET OVERLAP questions (see
    * `kmvJaccard`) — the sketch pair every audience-overlap dashboard
    * runs on. Estimate: (k-1)*2^40 div h_k (exact integer division,
    * identical in both engines); a stream with fewer than k distinct
    * hashes reports its exact size. The k-mins come from the map-side-
    * capped sorted aggregator — every partial buffer carries at most
    * k+1 longs, so the shuffle is O(k) per stream regardless of
    * corpus size.
    */
  def kmvUsers(s: SparkSession, d: String): DataFrame = {
    val capped = udaf(new graft.functions.CappedSortedIds(kmvK))
    val h = events(s, d)
      .select(col("event_type"), expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 10), 16, 10) AS BIGINT)")
        .as("h"))
      .distinct()
    val exact = events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    h.groupBy("event_type").agg(capped(col("h")).as("hs0"))
      .select(col("event_type"),
        slice(col("hs0"), 1, kmvK).as("hs"))
      .select(col("event_type"),
        element_at(col("hs"), size(col("hs"))).as("kth_min"),
        size(col("hs")).cast("long").as("k_used"))
      .withColumn("est_users",
        when(col("k_used") < kmvK, col("k_used"))
          .otherwise(expr(s"$kmvNum div greatest(kth_min, 1)")))
      .join(exact, "event_type")
      .select(col("event_type"), col("kth_min"), col("est_users"),
        col("exact_users"))
  }

  /** KMV overlap: for every unordered stream pair, the merged k-min
    * sketch (k smallest of the union — exactly the sketch a single
    * pass over both streams would build) and the share of its members
    * present in BOTH input sketches: jaccard_micro estimates J(A,B).
    * The per-stream sketches collapse to ONE bounded row
    * (streams x (k+1) longs), and every pair is expanded and scored
    * ROW-LOCALLY with array ops — no join, no cartesian, nothing
    * data-sized past the capped aggregation.
    */
  def kmvJaccard(s: SparkSession, d: String): DataFrame = {
    val capped = udaf(new graft.functions.CappedSortedIds(kmvK))
    val perType = events(s, d)
      .select(col("event_type"), expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 10), 16, 10) AS BIGINT)")
        .as("h"))
      .distinct()
      .groupBy("event_type").agg(capped(col("h")).as("hs0"))
      .select(col("event_type"), slice(col("hs0"), 1, kmvK).as("hs"))
    val pairs = flatten(transform(col("ts"), (x, i) =>
      transform(slice(col("ts"), i + lit(2),
        greatest(size(col("ts")) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))
    perType
      .agg(sort_array(collect_list(struct(col("event_type"), col("hs"))))
        .as("ts"))
      .select(explode(pairs).as("p"))
      .select(col("p.a.event_type").as("stream_a"),
        col("p.b.event_type").as("stream_b"),
        slice(array_sort(array_union(col("p.a.hs"), col("p.b.hs"))),
          1, kmvK).as("merged"),
        col("p.a.hs").as("ha"), col("p.b.hs").as("hb"))
      .select(col("stream_a"), col("stream_b"),
        size(filter(col("merged"), e =>
          array_contains(col("ha"), e) && array_contains(col("hb"), e)))
          .cast("long").as("overlap_k"),
        size(col("merged")).cast("long").as("m_used"))
      .withColumn("jaccard_micro",
        expr("(1000000 * overlap_k) DIV m_used"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sk_kmv" -> (kmvUsers _),
    "q_sk_kmv_jaccard" -> (kmvJaccard _),
    "q_sk_hll_merge" -> (hllMerge _),
    "q_sk_hist_quantile" -> (histQuantiles _),
    "q_sk_cms" -> (cmsTopTerms _),
    "q_sk_hll" -> (hllUsers _),
  )

  private val kmvSketchSql =
    s"""WITH hh AS (SELECT DISTINCT event_type,
       |    ('0x' || substr(md5(user_id::VARCHAR), 1, 10))::BIGINT AS h
       |  FROM events),
       |r AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM hh),
       |t AS (SELECT event_type, list(h ORDER BY h) AS hs
       |      FROM r WHERE rn <= $kmvK GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sk_kmv" ->
      s"""$kmvSketchSql,
         |x AS (SELECT event_type, count(*)::BIGINT AS exact_users
         |      FROM (SELECT DISTINCT event_type, user_id FROM events) u
         |      GROUP BY 1)
         |SELECT t.event_type, hs[len(hs)] AS kth_min,
         |  CASE WHEN len(hs) < $kmvK THEN len(hs)::BIGINT
         |    ELSE $kmvNum // greatest(hs[len(hs)], 1) END AS est_users,
         |  x.exact_users
         |FROM t JOIN x USING (event_type)""".stripMargin,
    "q_sk_kmv_jaccard" ->
      s"""$kmvSketchSql
         |SELECT stream_a, stream_b,
         |  len(list_filter(merged, e -> list_contains(ha, e)
         |    AND list_contains(hb, e)))::BIGINT AS overlap_k,
         |  len(merged)::BIGINT AS m_used,
         |  (1000000 * len(list_filter(merged, e -> list_contains(ha, e)
         |    AND list_contains(hb, e)))) // len(merged) AS jaccard_micro
         |FROM (
         |  SELECT a.event_type AS stream_a, b.event_type AS stream_b,
         |    a.hs AS ha, b.hs AS hb,
         |    (list_sort(list_distinct(a.hs || b.hs)))[1:$kmvK] AS merged
         |  FROM t a JOIN t b ON a.event_type < b.event_type) p""".stripMargin,
    "q_sk_hist_quantile" ->
      """WITH bounds AS (
        |  SELECT min(value) AS vmin, max(value) AS vmax,
        |    count(*) AS n_total FROM events),
        |b AS (
        |  SELECT least(CAST(floor(1000.0 * (value - vmin) / (vmax - vmin))
        |      AS BIGINT), 999) AS bucket,
        |    vmin, vmax, n_total
        |  FROM events, bounds),
        |g AS (SELECT bucket, vmin, vmax, n_total, count(*) AS cnt
        |      FROM b GROUP BY 1, 2, 3, 4),
        |c AS (SELECT *, sum(cnt) OVER (ORDER BY bucket
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM g),
        |p50 AS (SELECT round(vmin + bucket * (vmax - vmin) / 1000.0, 6)
        |          AS p50_est
        |        FROM c WHERE cum * 100 >= 50 * n_total
        |        ORDER BY bucket LIMIT 1),
        |p99 AS (SELECT round(vmin + bucket * (vmax - vmin) / 1000.0, 6)
        |          AS p99_est
        |        FROM c WHERE cum * 100 >= 99 * n_total
        |        ORDER BY bucket LIMIT 1)
        |SELECT p50_est, p99_est FROM p50, p99""".stripMargin,
    "q_sk_cms" -> {
      val cellSql = (j: Int) =>
        s"('0x' || substr(md5('${j}_' || term), 1, 4))::BIGINT % $cmsWidth"
      val grids = (0 until cmsDepth).map { j =>
        s"g$j AS (SELECT ${cellSql(j)} AS cell, count(*) AS c FROM occ GROUP BY 1)"
      }.mkString(",\n")
      val joins = (0 until cmsDepth).map { j =>
        s"JOIN g$j ON g$j.cell = ${cellSql(j)}"
      }.mkString("\n")
      val leastExpr = (0 until cmsDepth).map(j => s"g$j.c").mkString(", ")
      s"""WITH occ AS (
         |  SELECT unnest(str_split(text, ' ')) AS term FROM documents),
         |$grids,
         |top AS (
         |  SELECT term, count(*) AS exact_n FROM occ GROUP BY 1
         |  ORDER BY exact_n DESC, term LIMIT 20)
         |SELECT term, exact_n, least($leastExpr) AS cms_est
         |FROM top
         |$joins
         |ORDER BY exact_n DESC, term""".stripMargin
    },
    "q_sk_hll_merge" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |r AS (
        |  SELECT event_type, h % 256 AS reg,
        |    CASE WHEN h // 256 = 0 THEN 53
        |         ELSE 53 - length(bin(h // 256)) END AS rank
        |  FROM h),
        |per AS (SELECT event_type, reg, max(rank) AS mj FROM r GROUP BY 1, 2),
        |m AS (SELECT reg, max(mj) AS mj FROM per GROUP BY 1),
        |agg AS (
        |  SELECT count(*) AS m_present,
        |    sum(1::BIGINT << (53 - mj)::INT) AS sum_pow
        |  FROM m)
        |SELECT (SELECT count(DISTINCT user_id) FROM events
        |        WHERE event_type IN ('click', 'purchase')) AS exact_union,
        |  round(0.7182725932857715::DOUBLE * 256 * 256 * 9007199254740992.0
        |    / (sum_pow + (256 - m_present) * 9007199254740992)::DOUBLE, 6)
        |    AS hll_union_est
        |FROM agg""".stripMargin,
    "q_sk_hll" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (
        |  SELECT h % 256 AS reg,
        |    CASE WHEN h // 256 = 0 THEN 53
        |         ELSE 53 - length(bin(h // 256)) END AS rank
        |  FROM h),
        |m AS (SELECT reg, max(rank) AS mj FROM r GROUP BY 1),
        |agg AS (
        |  SELECT count(*) AS m_present,
        |    sum(1::BIGINT << (53 - mj)::INT) AS sum_pow
        |  FROM m)
        |SELECT (SELECT count(DISTINCT user_id) FROM events) AS exact_n,
        |  round(0.7182725932857715::DOUBLE * 256 * 256 * 9007199254740992.0
        |    / (sum_pow + (256 - m_present) * 9007199254740992)::DOUBLE, 6)
        |    AS hll_est
        |FROM agg""".stripMargin,
  )
}
