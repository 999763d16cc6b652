package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Shared session for the ETL suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val refData = "/root/reference/testdata"
  def golden(name: String): String =
    Files.readString(Paths.get(s"$refData/$name"))
}

class AesSpec extends AnyFunSuite {
  test("reproduces the reference ciphertext (key/IV from the regression suite)") {
    val got = Aes.encryptHex("LShtnwF", "changemetoo*****",
      Some("0" * 32))
    assert(got ==
      "000000000000000000000000000000008f2e710331fd036d0552dfe66c19b80a")
  }
  test("round-trips with random IV") {
    val ct = Aes.encryptHex("geheim βψ", "changemetoo*****", None)
    assert(Aes.decryptHex(ct, "changemetoo*****") == "geheim βψ")
    assert(ct.length > 32 && ct.matches("[0-9a-f]+"))
  }
}

class DumpCodecSpec extends AnyFunSuite {
  test("formatter escapes and parser round-trips hostile values") {
    import Directory.Entry
    val e = Entry("cn=o'brien,ou=user,ou=ph08,o=BMUKK", Map(
      "cn" -> Seq("o'brien"),
      "sn" -> Seq("back\\slash"),
      "objectClass" -> Seq("inetOrgPerson"),
      "phonlineBPK" -> Seq("plain+base64/chars="),
      "phonlineFunktionen" -> Seq("F_A:1", "F_B:2")))
    val line = Directory.formatEntry(e)
    assert(line.contains("cn=['o\\'brien']"), line)
    val back = Directory.parseLine(line)
    assert(back == e, s"round-trip mismatch:\n$line\n$back")
  }

  test("parse → format round-trips the full reference tree dumps") {
    for (f <- Seq("ldapII.txt", "ldap00.txt", "ldapI15.txt")) {
      val text = TestSpark.golden(f)
      val snap = Directory.parseDump(TestSpark.spark, text)
      assert(Directory.dump(snap) == text, s"round-trip mismatch for $f")
    }
  }
}

/** The reference's own system test, step 1 (test-compare:6–10): seed the
  * directory with the ldapII state, drop uids 4731/4732 from the DB,
  * run initial_load on ph08, and require byte-identical ldap00 output.
  */
class InitialLoadGoldenSpec extends AnyFunSuite {
  test("initial_load reproduces the ldap00 golden dump") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pre = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    val users = EtlSchema
      .readUsersCsv(spark, s"${TestSpark.refData}/initial_data.csv")
      .filter(!org.apache.spark.sql.functions.col("pk_uniqueid")
        .isin(4731.0, 4732.0))
    val conf = EtlConf(
      baseDn = "ou=user,ou=ph08,o=BMUKK",
      cryptoIvHex = Some("0" * 32))
    val r = InitialLoad.run(pre, users, conf)
    val got = Directory.dump(r.snapshot)
    val want = TestSpark.golden("ldap00.txt")
    if (got != want) {
      val gl = got.split("\n"); val wl = want.split("\n")
      val diffs = gl.zipAll(wl, "<missing>", "<missing>")
        .filter { case (a, b) => a != b }.take(3)
      fail("golden mismatch; first diffs:\n" + diffs.map {
        case (a, b) => s"got : $a\nwant: $b"
      }.mkString("\n"))
    }
    // no errors, no warnings on a clean load
    val bad = r.outcomes.filter(o => o.error.isDefined || o.skipped.isDefined)
    assert(bad.count() == 0)
  }
}
