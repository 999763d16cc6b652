package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Table-maintenance planning for the lakehouse side of a 100 TB
  * deployment: small-file compaction planning, incremental
  * materialized-view maintenance, and a zone-map skipping audit.
  * These are the jobs that keep a petabyte table CHEAP to query —
  * the reference never needs them (its tables live in an RDBMS/LDAP
  * that self-organizes), but any Spark re-deployment of the same
  * pipelines onto object-store parquet does, so they ship as
  * first-class, oracle-gated operators like everything else.
  *
  * All three are metadata-scale or aggregation-only plans: the
  * compaction planner and the skipping audit reduce the table to a
  * per-file/per-chunk stats frame FIRST (at 100 TB that frame comes
  * straight from parquet footers / table-format manifests, millions
  * of rows, not the data itself — here it is derived from the rows
  * because the fixtures are single files), and the MV merge touches
  * only partial-aggregate frames whose size is bounded by the group
  * cardinality, never the fact table.
  */
object Maintenance {

  /** Synthetic file-inventory granularity: the fixture tables are
    * single parquet files, so a per-file stats frame is modeled by
    * hashing rows into `InvFiles` pseudo-files with a deterministic,
    * content-derived byte size. At 100 TB the inventory is read from
    * the table format's manifest instead and everything downstream of
    * `inventory` is unchanged.
    */
  private val InvFiles = 499
  private val TargetBytes = 8000000L

  private[ops] def inventory(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(pmod(col("l_orderkey"), lit(InvFiles)).as("file_id"))
      // floor() before the long cast: a bare double→long cast truncates
      // in Spark but rounds in DuckDB, so a fractional quantity in a
      // future fixture would silently shift bin assignments
      .agg((sum(floor(col("l_quantity")).cast("long")) * 19
        + count(lit(1)) * 37).as("size_bytes"))

  /** Bin-fill compaction plan: files under the target size are laid
    * end-to-end in stable file_id order and cut into target-sized
    * bins (bin = which target-multiple the file STARTS in — the
    * streaming first-fit rule Delta/Iceberg OPTIMIZE uses). Files
    * already at/above target are left alone. The single global window
    * is over the file INVENTORY — metadata, ~1 row per file — so the
    * unpartitioned sort is a few million rows at 100 TB, not the
    * data; executing the plan is then one repartition-by-bin write
    * per bin, embarrassingly parallel.
    */
  def compactionPlan(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inventory(s, d)
      .filter(col("size_bytes") < TargetBytes)
      .withColumn("cum", sum("size_bytes").over(w))
      .withColumn("bin",
        floor((col("cum") - col("size_bytes")) / lit(TargetBytes.toDouble)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum("size_bytes").as("bin_bytes"))
  }

  private val D1 = "1997-01-01 00:00:00" // MV high-water mark
  private val D2 = "1998-01-01 00:00:00" // refresh horizon

  /** Incremental materialized-view maintenance: the standing MV holds
    * PARTIAL aggregates (count / decimal sum / max per group) up to a
    * high-water mark; a refresh aggregates only the delta slice and
    * merges partials — sum of counts, sum of sums, max of maxes. The
    * oracle is the full recompute over the union span, so the gate
    * verifies the algebraic-merge identity cell-exact. At 100 TB this
    * is the difference between scanning one day and one decade per
    * refresh; the merge input is two group-cardinality-bounded
    * frames, never facts. Decimal partials keep the sums exact and
    * order-independent; only the terminal representation is double.
    */
  def mvMerge(s: SparkSession, d: String): DataFrame = {
    def partials(df: DataFrame): DataFrame = df
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).as("sum_t"),
        max(dec(col("o_totalprice"))).as("max_t"))
    val o = orders(s, d)
    val base  = partials(o.filter(col("o_orderdate") < lit(D1).cast("timestamp")))
    val delta = partials(o.filter(col("o_orderdate") >= lit(D1).cast("timestamp")
      && col("o_orderdate") < lit(D2).cast("timestamp")))
    base.unionByName(delta)
      .groupBy("o_orderpriority")
      .agg(sum(col("n")).as("n_orders"),
        sum(col("sum_t")).cast("double").as("sum_total"),
        max(col("max_t")).cast("double").as("max_total"))
  }

  private val SkipLo = "1995-01-01 00:00:00"
  private val SkipHi = "1995-04-01 00:00:00" // exclusive

  /** Zone-map skipping audit: for three physical layouts of the same
    * table — date-clustered (chunk = ship month, a partition-by-month
    * write), z-ordered (chunk = coarse Morton cell over (ship day,
    * orderkey bits) — single-column skipping degrades but BOTH keys
    * keep some), and hash-scattered (the default shuffle layout) —
    * compute each chunk's min/max of the predicate column and count
    * how many chunks a range predicate could skip on stats alone,
    * plus the rows inside them. This is the measurement that
    * justifies (or kills) a 100 TB re-clustering rewrite BEFORE
    * paying for it: the audit is one pass of per-chunk min/max
    * aggregation — the same stats parquet footers already hold —
    * while the rewrite it prices is a full-table sort.
    */
  def skippingAudit(s: SparkSession, d: String): DataFrame = {
    val lo = lit(SkipLo).cast("timestamp")
    val hi = lit(SkipHi).cast("timestamp")
    // z-cell: 12-bit day since 1992-01-01 interleaved with 12 orderkey
    // bits (the q_o9_zorder Morton form), chunked by the top 6 Morton
    // bits — a z-ordered write's file boundaries ARE coarse z-ranges
    val day = datediff(col("l_shipdate"),
      lit("1992-01-01 00:00:00").cast("timestamp")).cast("long")
    val okey = col("l_orderkey").bitwiseAND(lit(4095L))
    val morton = (0 until 12).map { i =>
      shiftleft(shiftright(day, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(okey, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
    def cell(layout: String, chunk: Column): Column =
      struct(lit(layout).as("layout"), chunk.cast("long").as("chunk"))
    val skippable = col("mx") < lo || col("mn") >= hi
    // ONE scan: each row fans out to its three (layout, chunk) cells
    // and the per-cell min/max/count combines map-side, so the shuffle
    // carries cells (≤ chunks × 3 partials per task), never rows — the
    // shape that keeps the audit one pass over a 100 TB table
    lineitem(s, d)
      .select(col("l_shipdate"), explode(array(
        cell("clustered", year(col("l_shipdate")) * 12 + month(col("l_shipdate"))),
        cell("zordered", shiftright(morton, 18)),
        cell("hashed", pmod(col("l_orderkey"), lit(64))))).as("lc"))
      .groupBy(col("lc.layout").as("layout"), col("lc.chunk").as("chunk"))
      .agg(min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"),
        count(lit(1)).as("n_rows"))
      .groupBy("layout")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(skippable, lit(1L)).otherwise(lit(0L))).as("n_skipped"),
        sum(when(skippable, col("n_rows")).otherwise(lit(0L)))
          .as("rows_skipped"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_maint_compaction" -> (compactionPlan _),
    "q_maint_mv_merge" -> (mvMerge _),
    "q_maint_skipping" -> (skippingAudit _),
  )

  val oracles: Map[String, String] = Map(
    "q_maint_compaction" ->
      """WITH inv AS (
        |  SELECT l_orderkey % 499 AS file_id,
        |    SUM(CAST(FLOOR(l_quantity) AS BIGINT)) * 19 + COUNT(*) * 37 AS size_bytes
        |  FROM lineitem GROUP BY 1
        |), sized AS (
        |  SELECT file_id, size_bytes,
        |    SUM(size_bytes) OVER (ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM inv WHERE size_bytes < 8000000
        |)
        |SELECT CAST(FLOOR((cum - size_bytes) / CAST(8000000 AS DOUBLE)) AS BIGINT) AS bin,
        |  COUNT(*) AS n_files, CAST(SUM(size_bytes) AS BIGINT) AS bin_bytes
        |FROM sized GROUP BY 1""".stripMargin,
    "q_maint_mv_merge" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_total
        |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q_maint_skipping" -> {
      val morton = (0 until 12).map { i =>
        s"(((day >> $i) & 1) << ${2 * i + 1}) | (((okey >> $i) & 1) << ${2 * i})"
      }.mkString(" | ")
      s"""WITH zsrc AS (
        |  SELECT l_shipdate,
        |    date_diff('day', TIMESTAMP '1992-01-01 00:00:00', l_shipdate) AS day,
        |    l_orderkey & 4095 AS okey
        |  FROM lineitem
        |), z AS (
        |  SELECT 'clustered' AS layout,
        |    year(l_shipdate) * 12 + month(l_shipdate) AS chunk,
        |    min(l_shipdate) AS mn, max(l_shipdate) AS mx, COUNT(*) AS n_rows
        |  FROM lineitem GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'zordered' AS layout, ($morton) >> 18 AS chunk,
        |    min(l_shipdate) AS mn, max(l_shipdate) AS mx, COUNT(*) AS n_rows
        |  FROM zsrc GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'hashed' AS layout, l_orderkey % 64 AS chunk,
        |    min(l_shipdate) AS mn, max(l_shipdate) AS mx, COUNT(*) AS n_rows
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT layout, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN mx < TIMESTAMP '1995-01-01 00:00:00'
        |    OR mn >= TIMESTAMP '1995-04-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        |  CAST(SUM(CASE WHEN mx < TIMESTAMP '1995-01-01 00:00:00'
        |    OR mn >= TIMESTAMP '1995-04-01 00:00:00' THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped
        |FROM z GROUP BY 1""".stripMargin
    },
  )
}
