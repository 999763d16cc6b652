package graft.etl

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.LoggerConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import Directory.Entry

/** Plan-hygiene gate: the CDC cycle must emit ZERO HintErrorLogger
  * warnings. A broadcast hint that lands on an unusable side (e.g. the
  * left/stream side of a left_anti) is silently dropped by Spark with a
  * "Hint ... is not supported" warning — harmless for results but a
  * signal that a hint is decorating the wrong join site. The hinted
  * uid-set must only feed the left_semi lookup (build side), never the
  * anti-join sweep (round-10 finding 3).
  */
class HintHygieneSpec extends AnyFunSuite {

  private final class Capture extends AbstractAppender(
      "graft-hint-capture", null, null, true,
      Array.empty[org.apache.logging.log4j.core.config.Property]) {
    val messages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def append(e: LogEvent): Unit =
      messages.add(e.getMessage.getFormattedMessage)
  }

  test("CDC cycle fires no HintErrorLogger warning (broadcast hint lands only where usable)") {
    val spark = TestSpark.spark
    import spark.implicits._

    val loggerName = "org.apache.spark.sql.catalyst.analysis.HintErrorLogger"
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val cap = new Capture
    cap.start()
    val lc = new LoggerConfig(loggerName, Level.WARN, true)
    lc.addAppender(cap, Level.WARN, null)
    cfg.addLogger(loggerName, lc)
    ctx.updateLoggers()
    try {
      // a cycle whose batch BOTH merges present uids and delete-marks an
      // absent one, so the semi-join AND the anti-join sweep execute
      val base = "ou=user,ou=ph08,o=BMUKK"
      val users = EtlSchema
        .readUsersCsv(spark, s"${TestSpark.refData}/initial_data.csv")
        .filter(col("ident_nr") === -880406.0) // uid 1 present
      val conf = EtlConf(baseDn = base, cryptoIvHex = Some("0" * 32))
      val pre = InitialLoad.run(spark.emptyDataset[Entry], users, conf)
      val mkEvent = (rid: Double, uid: String) => (rid, s"pk_uniqueid=$uid",
        "N  ", 6.0, java.sql.Timestamp.valueOf("2017-07-11 10:00:00"),
        "TEST", "benutzer_alle_dirxml_v", null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[Double], "N  ", "N  ",
        null.asInstanceOf[java.sql.Timestamp], null.asInstanceOf[String],
        1.0, "N  ")
      val elog = spark.createDataFrame(Seq(
        mkEvent(1.0, "1"),        // present → MERGE path
        mkEvent(2.0, "424242")))  // absent → anti-join delete-mark path
        .toDF(EtlSchema.eventFields: _*)

      val r = Cdc.cycle(pre.snapshot, users, elog, conf)
      r.snapshot.count()
      r.eventUpdates.count()
      r.eventlog.count()

      val hits = cap.messages.toArray(Array.empty[String])
        .filter(m => m.contains("not supported") || m.contains("Hint"))
      assert(hits.isEmpty,
        s"HintErrorLogger fired during the CDC cycle:\n${hits.mkString("\n")}")
    } finally {
      cfg.removeLogger(loggerName)
      ctx.updateLoggers()
      cap.stop()
    }
  }
}
