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
      // keep LocalRelation filters visible in the optimized plan, so
      // the rewrite assertions below can see the predicate at all
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
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
      // the injected optimizer rule rewrites levenshtein guards into
      // the banded predicate — and preserves results incl. null rows
      import spark.implicits._
      val df = Seq(("kitten", "sitten"), ("kitten", "sitting"),
        (null, "x")).toDF("a", "b")
      val guarded = df.filter(org.apache.spark.sql.functions
        .expr("levenshtein(a, b) <= 1"))
      assert(guarded.queryExecution.optimizedPlan.toString
        .contains("graft_edit_within"),
        guarded.queryExecution.optimizedPlan.toString)
      assert(guarded.collect().map(r => (r.getString(0), r.getString(1)))
        .toSeq == Seq(("kitten", "sitten")))
      // strict form shifts the threshold; negative thresholds are left
      // to constant-ish evaluation untouched
      val strict = df.filter(org.apache.spark.sql.functions
        .expr("levenshtein(a, b) < 2"))
      assert(strict.queryExecution.optimizedPlan.toString
        .contains("graft_edit_within"))
      assert(strict.collect().length == 1)
      val neg = df.filter(org.apache.spark.sql.functions
        .expr("levenshtein(a, b) <= -1"))
      assert(!neg.queryExecution.optimizedPlan.toString
        .contains("graft_edit_within"))
      assert(neg.collect().isEmpty)
    } finally {
      // do not stop(): the SparkContext is shared with the other suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
