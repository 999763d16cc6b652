package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import Directory.Entry
import graft.streaming.CdcStream

/** The complete two-tree deployment the reference's test container
  * actually runs: the CDC loop multiplexes (ph08, postgres) and
  * (ph15, postgres) over one shared eventlog, so ph15 evolves only via
  * the C9 write-through (scenario 04's surname+password) and the C3
  * rename queue (scenario 05 renames tcxctuv.fzql.1 → .9). After all
  * eight scenarios the ph08 subtree must still match ldap08 and the
  * ph15 subtree must match the final ldapI15 golden byte-for-byte.
  */
class TwoTreeScenarioSpec extends AnyFunSuite {

  private def upsert(db: DataFrame, cs: DataFrame): DataFrame = {
    val kept = db.join(cs.select("pk_uniqueid"), Seq("pk_uniqueid"), "left_anti")
    val replaced = db.select("pk_uniqueid").join(cs, Seq("pk_uniqueid"))
    val inserted = cs.join(db.select("pk_uniqueid"), Seq("pk_uniqueid"), "left_anti")
    val cols = db.columns.toSeq
    kept.select(cols.map(col): _*)
      .unionByName(replaced.select(cols.map(col): _*))
      .unionByName(inserted.select(cols.map(col): _*))
  }

  private def subtree(snap: org.apache.spark.sql.Dataset[Entry],
      base: String): String = {
    import snap.sparkSession.implicits._
    Directory.dump(snap.filter(e => e.dn == base || e.dn.endsWith("," + base)))
  }

  test("two-tree loop reproduces ldap08 and the final ldapI15 golden") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pre = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    var db = EtlSchema
      .readUsersCsv(spark, s"${TestSpark.refData}/initial_data.csv")
      .filter(!col("pk_uniqueid").isin(4731.0, 4732.0))
      .localCheckpoint(true)
    val conf08 = EtlConf(baseDn = "ou=user,ou=ph08,o=BMUKK",
      cryptoIvHex = Some("0" * 32), etlTimestamp = "20170101000000Z",
      ph15Dn = Some("ou=user,ou=ph15,o=BMUKK"))
    val conf15 = conf08.copy(baseDn = "ou=user,ou=ph15,o=BMUKK")
    var snap = InitialLoad.run(pre, db, conf08).snapshot.localCheckpoint(true)
    var elog = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      EtlSchema.eventSchema)

    for ((nn, i) <- Seq("01", "02", "03", "04", "05", "06", "07", "08").zipWithIndex) {
      snap = SyncEngine.setEtdDone(snap, Some("4715"))
      val cs = EtlSchema.readUsersCsv(spark,
        s"${TestSpark.refData}/changeset$nn.csv")
      if (!cs.isEmpty) db = upsert(db, cs)
      val events = EtlSchema.readEventsCsv(spark,
        s"${TestSpark.refData}/eventlog$nn.csv")
      val delUids = events.filter(col("event_type") === 4.0)
        .select(split(col("table_key"), "=").getItem(1).cast("double")
          .as("del_uid"))
      db = db.join(delUids, col("pk_uniqueid") === col("del_uid"), "left_anti")
        .localCheckpoint(true)
      elog = elog.unionByName(events).localCheckpoint(true)

      val usersNow = db
      val st = CdcStream.run(
        // distinct cyclesRun seed per scenario keeps etlTimestamps
        // unique across scenarios (GC compares etd == etl)
        CdcStream.LoopState(snap, Map("postgres" -> elog), i * 10, 0),
        Seq(
          CdcStream.Source(conf08, () => usersNow, "postgres"),
          CdcStream.Source(conf15, () => usersNow, "postgres")),
        sleeper = () => ())
      snap = st.snapshot.localCheckpoint(true)
      elog = st.eventlogs("postgres").localCheckpoint(true)

      val got08 = subtree(snap, "ou=ph08,o=BMUKK")
      assert(got08 == TestSpark.golden(s"ldap$nn.txt"),
        s"scenario $nn ph08 mismatch")
      snap = SyncEngine.setEtdDone(snap, None)
    }

    val got15 = subtree(snap, "ou=user,ou=ph15,o=BMUKK")
    val want15 = TestSpark.golden("ldapI15.txt")
    if (got15 != want15) {
      val diffs = got15.split("\n").zipAll(want15.split("\n"), "<m>", "<m>")
        .filter { case (a, b) => a != b }.take(2)
      fail("ldapI15 mismatch:\n" + diffs.map {
        case (a, b) => s"got : $a\nwant: $b"
      }.mkString("\n"))
    }
  }
}
