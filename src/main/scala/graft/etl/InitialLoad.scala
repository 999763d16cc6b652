package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import Directory.Entry
import SyncEngine.MergeRow

/** §3.2 — snapshot sync: the reference's `initial_load`
  * (etl.py:868–921) as one declarative pipeline:
  * read users → convert → two-key-priority MERGE (every row `is_new`) →
  * anti-join deletion sweep of directory uids absent from the database
  * (the reference's driver-side `uidmap` becomes a left-anti join, J3).
  */
object InitialLoad {

  case class Result(snapshot: Dataset[Entry], outcomes: Dataset[MergeRow])

  def run(snapshot0: Dataset[Entry], users: DataFrame, conf: EtlConf)
      : Result = {
    val spark = snapshot0.sparkSession
    import spark.implicits._

    // ensure structural entries exist (C10); union + dedup on dn keeps
    // any pre-existing entry (with its server-side attrs) over ours
    val boot = spark.createDataset(Directory.bootstrapEntries(Seq(conf.baseDn)))
    val existingDns = snapshot0.toDF.select(col("dn").as("bdn"))
    val missingBoot = boot.toDF
      .join(existingDns, col("dn") === col("bdn"), "left_anti")
      .as[Entry]
    val seeded = snapshot0.union(missingBoot)

    val newRows0 = SyncEngine.toNewRows(users)
    val newRows = newRows0.withColumn("is_new", lit(true))
    val (merged, outcomes) = SyncEngine.merge(seeded, newRows, conf)

    // deletion sweep (J3): directory uids under the base not present in
    // the load, unless marked deleted (etl.py:900–914)
    val underBase = Directory.parentDnCol(col("dn")) === conf.baseDn
    val uidCol = element_at(col("attrs")("phonlineUniqueId"), 1)
    val dbUids = newRows0
      .select(col("src_uid").as("db_uid")).distinct()
    val doomed = merged.toDF
      .filter(underBase && uidCol.isNotNull &&
        !map_contains_key(col("attrs"), "idnDeleted"))
      .join(dbUids, uidCol === col("db_uid"), "left_anti")
      .select(col("dn").as("ddn"))
    val swept = merged.toDF
      .join(doomed, col("dn") === col("ddn"), "left_anti")
      .as[Entry]

    Result(swept, outcomes)
  }
}
