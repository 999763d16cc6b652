package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions hook must make the native functions resolvable in a
  * fresh session with no per-session register call — the deployment
  * path for the library on a shared cluster.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions registers graft functions session-wide") {
    // getOrCreate returns any existing default session (which would not
    // carry the extensions): park the shared test session, build a
    // fresh one over the same SparkContext, restore afterwards
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val sim = spark.sql(
        "SELECT graft_simhash(array('a', 'b', 'c')) AS h").collect()(0)
      assert(sim.getLong(0) >= 0 && sim.getLong(0) < (1L << 16))
      val ed = spark.sql(
        "SELECT graft_edit_within('kitten', 'sitten', 1) AS ok," +
          " graft_edit_within('kitten', 'sitting', 1) AS no").collect()(0)
      assert(ed.getBoolean(0) && !ed.getBoolean(1))
      // newSession inherits the injected registry (application-scoped)
      val ns = spark.newSession()
      assert(ns.sql("SELECT graft_edit_within('a', 'a', 1) AS ok")
        .collect()(0).getBoolean(0))
    } finally {
      // do not stop(): the SparkContext is shared with the other suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
