package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: run the named queries (or all, with no
  * args) against SPARK_GRAFT_SF_DIR a few times each and print per-run
  * wall times, so plan pathologies show up without running the whole
  * bench. `-explain` additionally prints the formatted plan once.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-")).toSeq
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
    val qs =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.map(n => n -> SparkEntry.queries(n))
    // per-query scheduler counters: a constant-size fixture query whose
    // cost is job/stage COUNT (not data) shows up here directly
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    // with -jobs: per-job wall time + the triggering call site, so a
    // query whose cost is a particular exchange/action names it
    val showJobs = args.contains("-jobs")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map { p =>
            val d = p.getProperty("spark.job.description",
              p.getProperty("callSite.short", "?"))
            if (d.length > 80) d.take(80) + "…" else d
          }.getOrElse("?")))
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStart.remove(j.jobId)).foreach { case (t0, site) =>
          if (showJobs)
            println(f"    job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // listener-bus events are delivered asynchronously: counters read
    // right after count() returns can miss the tail of the run. No
    // public flush API, so poll until the trio is stable across two
    // 50 ms reads (bounded at 1 s) before reporting.
    def settled(): (Int, Int, Int) = {
      var prev = (-1, -1, -1)
      var cur = (jobs.get, stages.get, tasks.get)
      var waited = 0
      while (cur != prev && waited < 1000) {
        Thread.sleep(50); waited += 50
        prev = cur
        cur = (jobs.get, stages.get, tasks.get)
      }
      cur
    }
    try qs.foreach { case (name, fn) =>
      if (explain) fn(spark, sfDir).explain("formatted")
      var counts = (0, 0, 0)
      val times = (1 to 3).map { _ =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        counts = settled()
        dt
      }
      println(f"$name%-28s ${times.map(t => f"$t%7.3f").mkString(" ")}" +
        f"  last-run: ${counts._1}%3d jobs ${counts._2}%4d stages ${counts._3}%5d tasks")
    } finally spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
