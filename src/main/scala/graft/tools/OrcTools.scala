package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC interchange — the second columnar format big lakes actually
  * hold (Hive-era warehouses are ORC end to end; a corpus engine that
  * can only ingest parquet can't read them in place). Spark's ORC
  * reader is built in and vectorized, with the same pushdown/pruning
  * surface as parquet — the round trip here pins that the engine's
  * schema contract survives the format change bit-for-bit.
  *
  * Scale notes: ORC stripes (like parquet row groups) carry min/max
  * statistics, so time/key-predicate scans prune stripes the same way
  * S2/S4 pin for parquet; the writer's partitioning sets stripe
  * layout, and a columnar binary format (unlike the JSONL text path)
  * round-trips floats exactly — the audit still aggregates longs and
  * strings only so all three format audits stay comparable.
  */
object OrcTools {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  /** Round-trip audit, same contract as JsonlTools.roundTrip: dump the
    * documents table to ORC, read it back, report per-source exact
    * counts/sums against the parquet oracle. Schema travels IN the ORC
    * footer (self-describing, unlike the enforced-schema JSONL read);
    * corrupt-record routing does not apply to a binary columnar format
    * — a damaged stripe is a hard read error, not a quarantined row —
    * so the n_corrupt column pins 0 by construction.
    */
  def roundTrip(s: SparkSession, d: String): DataFrame = {
    val tmp = JsonlTools.dumpDir(d, "orc")
    writeOrc(graft.Tables.documents(s, d), tmp)
    readOrc(s, tmp)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        lit(0L).as("n_corrupt"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
  }
}
