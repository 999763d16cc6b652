package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout (driver contract).
  *
  * Runs every registered query against SPARK_GRAFT_SF_DIR with the
  * local-mode tuning we'd also start from on a real cluster: shuffle
  * partitions sized to cores (not the 200 default), AQE on (runtime
  * coalescing + skew-join splitting), auto broadcast for the small dims.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm pass at the smallest SF first: JIT + whole-stage-codegen
    // class compilation amortize across the fleet in steady state, so
    // the timed pass below measures plan execution, not first-call
    // classloading.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    // Per-query timing with explicit failure tracking: a query that
    // throws is listed under "failed" so a regression can never
    // masquerade as a fast run. Median of 3 runs per query: the bench
    // box shows 3-6x scheduling swings on unchanged queries, and a
    // median filters one-off contention spikes out of the round-over-
    // round deltas.
    // malformed env must not kill the bench — a crash here re-creates
    // the parsed:null failure this contract exists to prevent
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).getOrElse(3).max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val median = runs.map(_._1).sorted.apply((runs.size - 1) / 2)
      (name, median, runs.forall(_._2))
    }
    val json = renderJson(results, sfDir)
    // Three redundant channels so any driver heuristic finds the line:
    // a sentinel-prefixed copy (greppable), a well-known file in the
    // repo root, and the bare JSON on its own stdout line (passed
    // through raw — build.sbt sets run/outputStrategy := StdoutOutput).
    System.out.println("GRAFT_BENCH_JSON " + json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LAST.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.out.println(json)
    System.out.flush()
    spark.stop()
  }

  /** The driver-contract line: ONE JSON object. Timings round to ms so
    * the line stays short enough for log-tail capture (the round-1
    * full-precision line overflowed the driver's tail buffer and
    * failed to parse); Locale.ROOT because a comma-decimal default
    * locale would corrupt the JSON.
    */
  def renderJson(results: Seq[(String, Double, Boolean)], sfDir: String): String = {
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
  }
}
