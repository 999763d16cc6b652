package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Snapshot persistence: atomic pointer-swap versioning and the
  * parent-dn-partitioned layout whose LEVEL scans prune partitions
  * (the 100 TB read path).
  */
class SnapshotStoreSpec extends AnyFunSuite {

  test("save/load round-trips through the versioned pointer") {
    val spark = TestSpark.spark
    val snap = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    Directory.save(snap, dir)
    val back = Directory.load(spark, dir)
    assert(Directory.dump(back) == TestSpark.golden("ldapII.txt"))
    // a second save atomically supersedes the first
    Directory.save(back.filter(_.dn.contains("ph08")), dir)
    assert(Directory.load(spark, dir).count() ==
      snap.filter(_.dn.contains("ph08")).count())
  }

  test("partitioned layout prunes LEVEL scans to one partition") {
    val spark = TestSpark.spark
    val snap = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Directory.savePartitioned(snap, dir)
    assert(Directory.loadPartitioned(spark, dir).count() == snap.count())

    val level = Directory.levelScan(spark, dir, "ou=user,ou=ph08,o=BMUKK")
    val expected = snap.filter(e =>
      Directory.parentDn(e.dn) == "ou=user,ou=ph08,o=BMUKK").count()
    assert(level.count() == expected && expected > 0)
    // the physical plan must show a partition-pruning filter, i.e. the
    // scan reads the one matching directory, not the whole snapshot
    val plan = level.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(parent"),
      s"expected partition pruning in:\n$plan")
  }
}
