package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Pins the round-20 drain internals: pooled per-query child sessions
  * (one clone per (caller session, drain prefix), reused across
  * executions) and ephemeral RAM-backed checkpoints (fresh dir per
  * drain, deleted after stop). The observable contract is unchanged —
  * repeated drains of one query return the identical result — and the
  * scaffolding must not accumulate: no leftover checkpoint dirs, and a
  * bounded memory-sink table count per query regardless of how many
  * times it runs.
  */
class DrainPoolSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("repeated drains return the identical result on the pooled session") {
    val spark = TestSpark.spark
    val q = graft.operators.StreamToolOps.queries("q_stream_dedup")
    val a = q(spark, dir).orderBy("user_id", "event_type").collect().toSeq
    val b = q(spark, dir).orderBy("user_id", "event_type").collect().toSeq
    val batch = graft.Tables.events(spark, dir)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type").collect().toSeq
    assert(a == batch)
    assert(b == batch)
  }

  test("drain checkpoints are cleaned up after the query stops") {
    val spark = TestSpark.spark
    val q = graft.operators.StreamToolOps.queries("q_stream_tumbling")
    q(spark, dir).count()
    val pid = ProcessHandle.current().pid()
    // every drain checkpoint carries this process's pid in its name and
    // is deleted in the same finally that stops the query — any survivor
    // under the scratch base is a leak
    val base = new java.io.File(
      graft.StreamScratch.checkpointDir("probe")).getParentFile
    val leaked = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"graft_ck_${pid}_stream_"))
    assert(leaked.isEmpty,
      s"leaked drain checkpoints: ${leaked.map(_.getName).mkString(", ")}")
  }

  test("memory-sink tables stay bounded across repeated drains") {
    val spark = TestSpark.spark
    val q = graft.operators.StreamToolOps.queries("q_stream_static")
    q(spark, dir).count()
    q(spark, dir).count()
    q(spark, dir).count()
    val pooled = graft.operators.StreamToolOps.drainPool
      .get((spark, "stream_static"))
    assert(pooled != null, "expected a pooled drain session for the prefix")
    val (child, _) = pooled
    // one live sink table per QUERY, not one per execution: each drain
    // drops the previous drain's table for its prefix
    val sinkTables = child.catalog.listTables()
      .filter(org.apache.spark.sql.functions.col("name")
        .startsWith("stream_static_"))
      .count()
    assert(sinkTables == 1L, s"expected 1 live sink table, got $sinkTables")
  }
}
