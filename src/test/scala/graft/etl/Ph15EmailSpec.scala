package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import Directory.Entry

/** J8 — student-email back-sync (ph15_email.py). The ldapII golden was
  * dumped immediately AFTER the reference ran its email sync
  * (test-compare:3–5), so the sync over that state must be a fixpoint;
  * perturbing a ph15 email must be healed back.
  */
class Ph15EmailSpec extends AnyFunSuite {
  private val bases = Seq("ou=user,ou=ph08,o=BMUKK", "ou=user,ou=ph15,o=BMUKK")

  test("golden state is a fixpoint of the email sync") {
    val spark = TestSpark.spark
    val snap = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    val synced = SyncEngine.ph15EmailSync(snap, bases)
    assert(Directory.dump(synced) == TestSpark.golden("ldapII.txt"))
  }

  test("a drifted ph15 email is healed back from the source tree") {
    val spark = TestSpark.spark
    import spark.implicits._
    val snap = Directory.parseDump(spark, TestSpark.golden("ldapII.txt"))
    val victim = "cn=caesar1,ou=user,ou=ph15,o=BMUKK"
    val drifted = snap.map { e =>
      if (e.dn == victim)
        Entry(e.dn, e.attrs + ("phonlineEmailStudent" -> Seq("stale@wrong.example")))
      else e
    }
    val healed = SyncEngine.ph15EmailSync(drifted, bases)
    val attrs = healed.filter(_.dn == victim).head().attrs
    assert(attrs("phonlineEmailStudent") == Seq("caesar1@gmail.com"))
    assert(Directory.dump(healed) == TestSpark.golden("ldapII.txt"))
  }
}
