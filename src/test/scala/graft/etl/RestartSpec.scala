package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operational fidelity: the engine must resume from a persisted
  * snapshot across process restarts — save after initial load, reload,
  * run the CDC batch, save, reload, and still match the golden dump
  * (map-typed attrs must round-trip parquet exactly).
  */
class RestartSpec extends AnyFunSuite {
  test("snapshot persistence round-trips through a full CDC scenario") {
    val spark = TestSpark.spark
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft-restart").toString

    // "process 1": initial load, persist, exit
    val pre = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    val users0 = EtlSchema
      .readUsersCsv(spark, s"${TestSpark.refData}/initial_data.csv")
      .filter(!col("pk_uniqueid").isin(4731.0, 4732.0))
    val conf = EtlConf(baseDn = "ou=user,ou=ph08,o=BMUKK",
      cryptoIvHex = Some("0" * 32))
    Directory.save(InitialLoad.run(pre, users0, conf).snapshot, store)

    // "process 2": reload, apply scenario 01, persist again
    val snap1 = Directory.load(spark, store)
    val cs = EtlSchema.readUsersCsv(spark, s"${TestSpark.refData}/changeset01.csv")
    val users = users0
      .join(cs.select("pk_uniqueid"), Seq("pk_uniqueid"), "left_anti")
      .unionByName(cs)
    val events = EtlSchema.readEventsCsv(spark,
      s"${TestSpark.refData}/eventlog01.csv")
    val r = Cdc.cycle(snap1, users, events,
      conf.copy(etlTimestamp = "20170101000700Z"))
    Directory.save(r.snapshot, store)

    // "process 3": reload and verify the golden state
    val got = Directory.dump(Directory.load(spark, store).filter(e =>
      e.dn == "ou=ph08,o=BMUKK" || e.dn.endsWith(",ou=ph08,o=BMUKK")))
    assert(got == TestSpark.golden("ldap01.txt"))
  }
}
