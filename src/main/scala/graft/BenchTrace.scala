package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler._

/** Env-gated per-rep diagnosis channel for the bench
  * (`SPARK_GRAFT_BENCH_TRACE=1`) — OFF in driver runs, so the stdout
  * contract is untouched; everything here goes to stderr.
  *
  * Exists to answer one question the artifact's [min,max] band cannot:
  * WHAT does an outlier rep pay that the fast reps don't? The listener
  * splits each rep's wall time into (a) executor CPU, (b) JVM GC inside
  * tasks, (c) stage scheduling gaps, (d) driver time outside any job —
  * the four distinct culprits (plan/AQE overhead, GC debt, storage
  * churn, scheduler contention) each land in a different bucket.
  */
object BenchTrace {
  final case class StageRec(stageId: Int, attempt: Int, name: String,
      submitMs: Long, doneMs: Long, runMs: Long, gcMs: Long, tasks: Int)
  final case class JobRec(jobId: Int, startMs: Long, endMs: Long)

  private val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
  private val jobs = new java.util.concurrent.ConcurrentLinkedQueue[JobRec]()
  private val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
  private val events = new java.util.concurrent.atomic.AtomicLong()
  @volatile private var installed = false

  def enabled: Boolean = sys.env.contains("SPARK_GRAFT_BENCH_TRACE")

  def install(sc: SparkContext): Unit = synchronized {
    if (installed) return
    installed = true
    sc.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        stages.add(StageRec(si.stageId, si.attemptNumber(), si.name,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          if (tm == null) 0L else tm.executorRunTime,
          if (tm == null) 0L else tm.jvmGCTime,
          si.numTasks))
        events.incrementAndGet()
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStarts.put(e.jobId, e.time)
        events.incrementAndGet()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStarts.remove(e.jobId))
          .map(_.longValue()).getOrElse(e.time)
        jobs.add(JobRec(e.jobId, t0, e.time))
        events.incrementAndGet()
      }
    })
  }

  /** Listener events arrive ASYNCHRONOUSLY (AsyncEventQueue) — read
    * immediately after an action returns, the final stage/job records
    * are routinely still in flight and their time would misattribute
    * to `driverGap`. Wait (outside the timed window) until the event
    * counter has been stable for 50 ms, bounded at 500 ms.
    */
  private def settle(): Unit = {
    var last = -1L
    var stableSince = nowMs
    val deadline = nowMs + 500
    while (nowMs < deadline) {
      val n = events.get()
      if (n != last) { last = n; stableSince = nowMs }
      else if (nowMs - stableSince >= 50) return
      Thread.sleep(10)
    }
  }

  /** Wall-clock marker (same clock as the listener events). */
  def nowMs: Long = System.currentTimeMillis()

  /** One-line-per-rep breakdown of everything that ran in [t0, t1],
    * plus the top stages by wall residency — enough to diff a 9.8 s rep
    * against a 2.0 s one from the log alone.
    */
  def report(tag: String, t0: Long, t1: Long): String = {
    settle()
    import scala.jdk.CollectionConverters._
    val ss = stages.asScala.filter(s => s.doneMs > t0 && s.submitMs < t1).toSeq
    val js = jobs.asScala.filter(j => j.endMs > t0 && j.startMs < t1).toSeq
    val wall = t1 - t0
    val run = ss.map(_.runMs).sum
    val gc = ss.map(_.gcMs).sum
    // union of job intervals → driver time is wall minus in-job time
    val inJob = unionLen(js.map(j => (j.startMs.max(t0), j.endMs.min(t1))))
    val inStage = unionLen(ss.map(s => (s.submitMs.max(t0), s.doneMs.min(t1))))
    val top = ss.sortBy(s => -(s.doneMs - s.submitMs)).take(5).map { s =>
      val nm = s.name.takeWhile(_ != '\n').take(48)
      s"[${s.stageId} ${nm} wall=${s.doneMs - s.submitMs} run=${s.runMs} gc=${s.gcMs} t=${s.tasks}]"
    }.mkString(" ")
    s"TRACE $tag wall=${wall}ms jobs=${js.size} stages=${ss.size} " +
      s"cpu=${run}ms gc=${gc}ms inJob=${inJob}ms inStage=${inStage}ms " +
      s"driverGap=${(wall - inJob).max(0)}ms top: $top"
  }

  /** Total length of the union of [lo, hi) intervals — overlapping
    * concurrent jobs/stages must not double-count wall time.
    */
  private[graft] def unionLen(iv: Seq[(Long, Long)]): Long = {
    var end = Long.MinValue
    var acc = 0L
    iv.filter(i => i._2 > i._1).sortBy(_._1).foreach { case (lo, hi) =>
      if (lo >= end) { acc += hi - lo; end = hi }
      else if (hi > end) { acc += hi - end; end = hi }
    }
    acc
  }
}
