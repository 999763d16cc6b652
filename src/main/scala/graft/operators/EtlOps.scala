package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl._

/** Driver-contract surface for the CDC/directory-sync engine (SURVEY.md
  * §2.8, §3). These queries exercise the real pipelines against the
  * reference's own fixture data; they are not SQL-expressible, so the
  * driver records rows-only checks — the byte-exact golden equivalence
  * lives in the ScalaTest suites (EtlCoreSpec).
  */
object EtlOps {

  private val refData = "/root/reference/testdata"

  /** Full initial_load against the reference fixtures; returns the
    * canonical dump as one row per directory entry (deterministic).
    */
  def etlInitialLoad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pre = Directory.parseDump(s,
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$refData/ldapII.txt")))
    val users = EtlSchema.readUsersCsv(s, s"$refData/initial_data.csv")
      .filter(!col("pk_uniqueid").isin(4731.0, 4732.0))
    val conf = EtlConf(baseDn = "ou=user,ou=ph08,o=BMUKK",
      cryptoIvHex = Some("0" * 32))
    val out = InitialLoad.run(pre, users, conf)
    out.snapshot
      .map(Directory.formatEntry _)
      .toDF("entry_line")
      .orderBy("entry_line")
  }

  /** Conversion-function surface (F1–F5) over the reference user CSV. */
  def etlConvert(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ConvertF._
    EtlSchema.readUsersCsv(s, s"$refData/initial_data.csv")
      .select(
        col("benutzername"),
        fromDbNumber(col("pk_uniqueid")).as("uid"),
        fromDbDate(col("geburtsdatum")).as("geb"),
        fromMulti(col("funktionen")).as("funk"),
        fromDbRstrip(col("vorname")).as("vorname"))
      .orderBy("benutzername")
  }

  /** One CDC micro-batch over the reference's scenario-01 fixtures:
    * golden initial load, apply the changeset, process the events, and
    * return the per-event status verdicts (C8 matrix) — deterministic.
    */
  def etlCdcBatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pre = Directory.parseDump(s,
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$refData/ldapII.txt")))
    val users0 = EtlSchema.readUsersCsv(s, s"$refData/initial_data.csv")
      .filter(!col("pk_uniqueid").isin(4731.0, 4732.0))
    val conf = EtlConf(baseDn = "ou=user,ou=ph08,o=BMUKK",
      cryptoIvHex = Some("0" * 32))
    val snap = InitialLoad.run(pre, users0, conf).snapshot.localCheckpoint(true)
    val cs = EtlSchema.readUsersCsv(s, s"$refData/changeset01.csv")
    val users = users0.join(cs.select("pk_uniqueid"), Seq("pk_uniqueid"), "left_anti")
      .unionByName(cs)
    val events = EtlSchema.readEventsCsv(s, s"$refData/eventlog01.csv")
    val r = Cdc.cycle(snap, users, events,
      conf.copy(etlTimestamp = "20170101000100Z"))
    r.eventUpdates
      .select(col("record_id"), col("new_status"), col("new_error"))
      .orderBy("record_id")
  }

  /** S8 — point entry lookup by dn over the loaded snapshot. */
  def dnLookup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    loadedSnapshot(s)
      .filter(col("dn") === "cn=caesar1,ou=user,ou=ph08,o=BMUKK")
      .select(col("dn"),
        element_at(col("attrs")("phonlineUniqueId"), 1).as("uid"),
        element_at(col("attrs")("sn"), 1).as("sn"))
  }

  /** S9 — keyed LEVEL search by phonlineUniqueId (non-unique: the three
    * caesar rows share uid 1).
    */
  def uidSearch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    loadedSnapshot(s)
      .filter(element_at(col("attrs")("phonlineUniqueId"), 1) === "1")
      .select(col("dn"))
      .orderBy("dn")
  }

  private def loadedSnapshot(s: SparkSession) = {
    import s.implicits._
    val pre = Directory.parseDump(s,
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$refData/ldapII.txt")))
    pre.toDF
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_etl_initial_load" -> (etlInitialLoad _),
    "q_s8_dn_lookup" -> (dnLookup _),
    "q_s9_uid_search" -> (uidSearch _),
    "q_etl_convert" -> (etlConvert _),
    "q_etl_cdc_batch" -> (etlCdcBatch _),
  )

  /** Not DuckDB-expressible (directory MERGE semantics) → rows-only. */
  val oracles: Map[String, String] = Map.empty
}
