package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry aggregated from the operator modules; every entry in
  * `queries` that is SQL-expressible has a DuckDB oracle in `oracleSql`
  * (same column names on both sides — the driver hash-compares).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  private[graft] def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracles),
      (operators.TpchStyle.queries, operators.TpchStyle.oracles),
      (operators.EtlOps.queries, operators.EtlOps.oracles),
      (operators.Windows.queries, operators.Windows.oracles),
      (operators.StreamToolOps.queries, operators.StreamToolOps.oracles),
      (operators.AsofJoin.queries, operators.AsofJoin.oracles),
      (operators.ScaleJoins.queries, operators.ScaleJoins.oracles),
      (operators.GraphOps.queries, operators.GraphOps.oracles),
      (operators.DataQuality.queries, operators.DataQuality.oracles),
      (operators.Behavior.queries, operators.Behavior.oracles),
      (operators.FunctionOps.queries, operators.FunctionOps.oracles),
      (ops.Dedup.queries, ops.Dedup.oracles),
      (ops.Similarity.queries, ops.Similarity.oracles),
      (ops.Clustering.queries, ops.Clustering.oracles),
      (ops.TextAnalysis.queries, ops.TextAnalysis.oracles),
      (ops.Multimodal.queries, ops.Multimodal.oracles),
      (ops.Curation.queries, ops.Curation.oracles),
      (ops.Sketches.queries, ops.Sketches.oracles),
      (ops.Maintenance.queries, ops.Maintenance.oracles),
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
