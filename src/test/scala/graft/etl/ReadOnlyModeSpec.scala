package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Read-only mode (§2.9): event_time HWM replaces status-flag offsets;
  * the HWM is a checkpointed offset that survives restarts and makes a
  * re-run of the same window a no-op.
  */
class ReadOnlyModeSpec extends AnyFunSuite {
  test("HWM offsets advance, checkpoint, and suppress reprocessing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pre = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    val users0 = EtlSchema
      .readUsersCsv(spark, s"${TestSpark.refData}/initial_data.csv")
      .filter(!col("pk_uniqueid").isin(4731.0, 4732.0))
    val conf = EtlConf(baseDn = "ou=user,ou=ph08,o=BMUKK",
      cryptoIvHex = Some("0" * 32))
    val snap0 = InitialLoad.run(pre, users0, conf).snapshot.localCheckpoint(true)
    val cs = EtlSchema.readUsersCsv(spark, s"${TestSpark.refData}/changeset01.csv")
    val users = users0
      .join(cs.select("pk_uniqueid"), Seq("pk_uniqueid"), "left_anti")
      .unionByName(cs).localCheckpoint(true)
    val elog = EtlSchema.readEventsCsv(spark,
      s"${TestSpark.refData}/eventlog01.csv").localCheckpoint(true)

    val ckpt = java.nio.file.Files.createTempDirectory("graft-hwm").toString
    val hwm0 = Cdc.HwmStore.load(ckpt, "postgres")
    assert(hwm0 == java.sql.Timestamp.valueOf("2017-01-01 00:00:00"))

    val (r1, hwm1) = Cdc.cycleReadOnly(snap0, users, elog, conf, hwm0)
    assert(hwm1.after(hwm0), "HWM must advance past processed events")
    Cdc.HwmStore.save(ckpt, "postgres", hwm1)
    val s1 = r1.snapshot.localCheckpoint(true)
    val got = Directory.dump(s1.filter(e =>
      e.dn == "ou=ph08,o=BMUKK" || e.dn.endsWith(",ou=ph08,o=BMUKK")))
    assert(got == TestSpark.golden("ldap01.txt"))

    // restart: reload checkpointed HWM → the same events are filtered out
    val hwmReloaded = Cdc.HwmStore.load(ckpt, "postgres")
    assert(hwmReloaded == hwm1)
    val (r2, hwm2) = Cdc.cycleReadOnly(s1, users, elog, conf, hwmReloaded)
    assert(hwm2 == hwm1)
    assert(r2.eventUpdates.isEmpty, "no events may reprocess under the HWM")
    assert(Directory.dump(r2.snapshot.filter(e =>
      e.dn == "ou=ph08,o=BMUKK" || e.dn.endsWith(",ou=ph08,o=BMUKK"))) == got)
  }
}
