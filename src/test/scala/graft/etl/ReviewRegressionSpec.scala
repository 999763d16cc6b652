package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import Directory.Entry

/** Regressions for defects found in review: merge fan-out on
  * duplicate-uid batches, null-blind event validation, duplicate-uid
  * warnings after cn-dedup, and email-sync duplication across source
  * trees.
  */
class ReviewRegressionSpec extends AnyFunSuite {

  private def baseUsers = {
    val spark = TestSpark.spark
    EtlSchema.readUsersCsv(spark, s"${TestSpark.refData}/initial_data.csv")
  }
  private val base = "ou=user,ou=ph08,o=BMUKK"
  private val conf = EtlConf(baseDn = base, cryptoIvHex = Some("0" * 32))

  test("two same-uid different-cn rows consume one entry without fan-out") {
    val spark = TestSpark.spark
    import spark.implicits._
    // one existing entry with uid 555 and a cn matching neither row
    val pre = spark.createDataset(
      Directory.bootstrapEntries(Seq(base)) :+ Entry(s"cn=oldname,$base", Map(
        "cn" -> Seq("oldname"), "phonlineUniqueId" -> Seq("555"),
        "objectClass" -> Seq("inetOrgPerson", "phonlinePerson", "idnSyncstat"))))
    val u1 = baseUsers.limit(1)
      .withColumn("pk_uniqueid", lit(555.0))
      .withColumn("benutzername", lit("alice"))
    val u2 = baseUsers.limit(1)
      .withColumn("pk_uniqueid", lit(555.0))
      .withColumn("benutzername", lit("bob"))
    val rows = SyncEngine.toNewRows(u1.unionByName(u2))
      .withColumn("is_new", lit(false))
    val (snap, _) = SyncEngine.merge(pre, rows, conf)
    val matches = snap.filter(_.attrs.get("phonlineUniqueId")
      .exists(_ == Seq("555"))).collect()
    assert(matches.length == 1, s"entry fanned out: ${matches.map(_.dn).toSeq}")
    assert(Directory.duplicateDns(snap).isEmpty)
  }

  test("NULL event fields fail validation with status F") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pre = spark.createDataset(Directory.bootstrapEntries(Seq(base)))
    val nullRow = (1.0, null.asInstanceOf[String], "N  ",
      null.asInstanceOf[java.lang.Double],
      java.sql.Timestamp.valueOf("2017-07-11 10:00:00"), "T",
      null.asInstanceOf[String], null.asInstanceOf[String],
      null.asInstanceOf[String], null.asInstanceOf[String],
      null.asInstanceOf[java.lang.Double], "N  ", "N  ",
      null.asInstanceOf[java.sql.Timestamp], null.asInstanceOf[String],
      1.0, "N  ")
    val elog = spark.createDataFrame(Seq(nullRow))
      .toDF(EtlSchema.eventFields: _*)
    val r = Cdc.cycle(pre, baseUsers, elog, conf)
    val v = r.eventUpdates.collect()
    assert(v.length == 1 && v.head.getString(1) == "F", v.toSeq.toString)
    assert(v.head.getString(2).startsWith("Invalid event_type"), v.toSeq.toString)
    // the reference never stamps read_time for validation failures
    assert(r.eventlog.filter(col("record_id") === 1.0)
      .head.getAs[java.sql.Timestamp]("read_time") == null)
  }

  test("duplicate user rows do not fan out the ph15 twin via write-through") {
    val spark = TestSpark.spark
    import spark.implicits._
    val confWt = conf.copy(ph15Dn = Some("ou=user,ou=ph15,o=BMUKK"))
    val pre = spark.createDataset(
      Directory.bootstrapEntries(Seq(base, "ou=user,ou=ph15,o=BMUKK")) ++ Seq(
        Entry(s"cn=wtu,$base", Map(
          "cn" -> Seq("wtu"), "phonlineUniqueId" -> Seq("888"),
          "givenName" -> Seq("Old"),
          "objectClass" -> Seq("inetOrgPerson", "phonlinePerson", "idnSyncstat"))),
        Entry("cn=wtu,ou=user,ou=ph15,o=BMUKK", Map(
          "cn" -> Seq("wtu"), "phonlineUniqueId" -> Seq("999"),
          "givenName" -> Seq("Old"),
          "objectClass" -> Seq("inetOrgPerson", "phonlinePerson", "idnSyncstat")))))
    val u = baseUsers.limit(1)
      .withColumn("pk_uniqueid", lit(888.0))
      .withColumn("benutzername", lit("wtu"))
      .withColumn("vorname", lit("Newname"))
    val users = u.unionByName(u) // duplicate rows, same cn/uid
    val elog = EtlSchema
      .readEventsCsv(spark, s"${TestSpark.refData}/eventlog01.csv")
      .limit(1)
      .withColumn("table_key", lit("pk_uniqueid=888"))
    val r = Cdc.cycle(pre, users, elog, confWt)
    assert(Directory.duplicateDns(r.snapshot).isEmpty,
      "write-through must not duplicate the ph15 dn")
    val twin = r.snapshot
      .filter(_.dn == "cn=wtu,ou=user,ou=ph15,o=BMUKK").collect()
    assert(twin.length == 1 && twin.head.attrs("givenName") == Seq("Newname"))
  }

  test("duplicate-uid warning survives same-cn rows (counted pre-dedup)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pre = spark.createDataset(
      Directory.bootstrapEntries(Seq(base)) :+ Entry(s"cn=dupuser,$base", Map(
        "cn" -> Seq("dupuser"), "phonlineUniqueId" -> Seq("777"),
        "objectClass" -> Seq("inetOrgPerson", "phonlinePerson", "idnSyncstat"))))
    val u = baseUsers.limit(1)
      .withColumn("pk_uniqueid", lit(777.0))
      .withColumn("benutzername", lit("dupuser"))
    val users = u.unionByName(u) // two identical rows, same cn, same uid
    val elog = EtlSchema
      .readEventsCsv(spark, s"${TestSpark.refData}/eventlog01.csv")
      .limit(1)
      .withColumn("table_key", lit("pk_uniqueid=777"))
    val r = Cdc.cycle(pre, users, elog, conf)
    val v = r.eventUpdates.head()
    assert(v.getString(1) == "W", v.toString)
    assert(v.getString(2).contains("Duplicate pk_uniqueid: 777"), v.toString)
  }

  test("email sync with two source trees does not duplicate the ph15 entry") {
    val spark = TestSpark.spark
    import spark.implicits._
    def user(tree: String, mail: String) =
      Entry(s"cn=multi,ou=user,ou=$tree,o=BMUKK", Map(
        "cn" -> Seq("multi"), "phonlineEmailStudent" -> Seq(mail),
        "phonlineStudentAktiv" -> Seq("J  ")))
    val snap = spark.createDataset(Seq(
      user("ph01", "a@x.org"), user("ph02", "b@x.org"),
      Entry("cn=multi,ou=user,ou=ph15,o=BMUKK", Map(
        "cn" -> Seq("multi"), "phonlineEmailStudent" -> Seq("old@x.org"),
        "phonlineStudentAktiv" -> Seq("J  ")))))
    val out = SyncEngine.ph15EmailSync(snap, Seq(
      "ou=user,ou=ph01,o=BMUKK", "ou=user,ou=ph02,o=BMUKK",
      "ou=user,ou=ph15,o=BMUKK"))
    assert(Directory.duplicateDns(out).isEmpty)
    val e15 = out.filter(_.dn == "cn=multi,ou=user,ou=ph15,o=BMUKK").collect()
    assert(e15.length == 1)
    assert(e15.head.attrs("phonlineEmailStudent") == Seq("b@x.org"))
  }
}
