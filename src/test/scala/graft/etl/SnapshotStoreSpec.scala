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

  test("compaction bounds file count and preserves contents exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val snap = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // simulate a fragmented store: one commit with write parallelism 16
    Directory.save(snap.repartition(16).as[Directory.Entry], dir)
    def liveFiles: Int = {
      val v = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/CURRENT")).trim
      new java.io.File(s"$dir/$v").listFiles()
        .count(_.getName.endsWith(".parquet"))
    }
    assert(liveFiles == 16, s"fragmented store expected, got $liveFiles")
    val before = Directory.dump(Directory.load(spark, dir))
    val written = Directory.compact(spark, dir)
    assert(written == 1 && liveFiles == 1,
      s"expected 1 compacted file, got $written/$liveFiles")
    assert(Directory.dump(Directory.load(spark, dir)) == before,
      "compaction must not change snapshot contents")
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
