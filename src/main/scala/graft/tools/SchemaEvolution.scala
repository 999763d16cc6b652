package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution read — the source capability a long-lived lake
  * actually exercises: files written by pipeline version 1 (narrow
  * schema) sit next to files written by version 2 (a column added),
  * and every consumer must scan BOTH generations in one pass with the
  * missing column null-filled, no rewrite of the old data. The
  * reference's fixed-schema CSV/DB readers sidestep this by fiat; a
  * corpus engine at 100 TB cannot (rewriting petabytes to add a
  * column is the anti-pattern this read path exists to avoid).
  *
  * Spark-first: `mergeSchema` unions the parquet footers into one
  * evolved schema at planning time; each file scan then projects its
  * own physical columns and null-fills the rest — columnar, pushdown
  * and pruning intact, zero per-row interpretation. Scale note: the
  * merge reads FOOTERS, not data, and Spark distributes footer
  * reading across the cluster; production lakes with stable schemas
  * pin the evolved schema explicitly (`.schema(...)`) to skip even
  * that, which this op's contract permits since null-fill semantics —
  * what the audit pins — are identical either way.
  */
object SchemaEvolution {

  /** Round-trip audit, same contract as the JSONL/ORC trips: stage the
    * documents table as two parquet generations — gen 1 written
    * WITHOUT the `lang` column (the v1 pipeline), gen 2 with it — then
    * read both directories through one mergeSchema scan and report
    * per-source counts, null-filled legacy rows, evolved rows, and the
    * exact char mass. The even/odd doc_id split is deterministic, so
    * the DuckDB oracle reproduces the generation boundary from the
    * original table alone.
    */
  def roundTrip(s: SparkSession, d: String): DataFrame = {
    val base = JsonlTools.dumpDir(d, "schevo")
    val docs = graft.Tables.documents(s, d)
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(base + "/gen1")
    // n_legacy below counts `lang IS NULL` on the merged scan while the
    // oracle counts by the staging parity (doc_id % 2) — the two only
    // coincide if every gen-2 row carries a non-null lang. Enforce that
    // at write time THROUGH the written column (a side-channel check
    // column would be pruned as unused): a null lang in the source
    // fails the stage loudly instead of silently misclassifying gen-2
    // rows as legacy and diverging from the oracle.
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), col("n_chars"),
        when(col("lang").isNotNull, col("lang"))
          .otherwise(raise_error(concat(
            lit("schema-evolution staging: null lang at doc_id="),
            col("doc_id").cast("string"))))
          .as("lang"))
      .write.mode("overwrite").parquet(base + "/gen2")
    s.read.option("mergeSchema", "true")
      .parquet(base + "/gen1", base + "/gen2")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_legacy"),
        count(col("lang")).as("n_evolved"),
        sum(col("n_chars")).as("sum_chars"))
  }
}
