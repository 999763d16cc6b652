package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import SyncEngine.{MatchIn, MergeRow}

/** The column-expression merge kernel (`mergeRowsPlan`) must be
  * pointwise identical to the typed kernel (`mergeOne`), which is the
  * executable specification of the reference's sync_to_ldap
  * (etl.py:923–1110). Covers every guard branch by hand, then a seeded
  * random sweep over attribute maps, flags, and password states.
  */
class MergeKernelEquivalenceSpec extends AnyFunSuite {

  private val conf = EtlConf(baseDn = "ou=user,ou=ph08,o=BMUKK",
    cryptoIvHex = Some("ab" * 16), etlTimestamp = "20200101000000Z")
  // ph15 conf exercises the notSyncedPh15 field exclusion in the loop
  private val conf15 = conf.copy(baseDn = "ou=user,ou=ph15,o=BMUKK")
  private val base = conf.baseDn

  private def assertEquivalent(ins: Seq[MatchIn], label: String,
      c: EtlConf = conf): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.createDataset(ins).toDF.localCheckpoint(true)
    val typed = SyncEngine.mergeRowsTyped(df, c).collect()
    val plan = SyncEngine.mergeRowsPlan(df, c).as[MergeRow].collect()
    assert(typed.length == plan.length, s"$label: row count")
    typed.zip(plan).zipWithIndex.foreach { case ((t, p), i) =>
      assert(p == t, s"$label row $i diverged:\n typed=$t\n plan =$p\n in=${ins(i)}")
    }
  }

  private def dn(cn: String) = s"cn=$cn,$base"
  private val storedPw = Aes.encryptHex("secret", conf.aesKey, Some("cd" * 16))

  test("hand-picked branch coverage rows match the typed kernel") {
    val rows = Seq(
      // skip guards
      MatchIn(null, "1", None, Map.empty, isNew = true, None, None,
        cnMatched = false, uidAmbiguous = false),
      MatchIn("", "1", None, Map.empty, isNew = true, None, None,
        cnMatched = false, uidAmbiguous = false),
      MatchIn("bob", null, None, Map.empty, isNew = true, None, None,
        cnMatched = false, uidAmbiguous = false),
      MatchIn("bob", "", None, Map.empty, isNew = true, None, None,
        cnMatched = false, uidAmbiguous = false),
      MatchIn(null, null, None, Map.empty, isNew = false, None, None,
        cnMatched = false, uidAmbiguous = false),
      // uid-ambiguous error
      MatchIn("bob", "7", None, Map("cn" -> Seq("bob")), isNew = false,
        None, None, cnMatched = false, uidAmbiguous = true),
      // deleted entry with different uid under the same cn → error
      MatchIn("bob", "7", None, Map("cn" -> Seq("bob")), isNew = false,
        Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "idnDeleted" -> Seq("TRUE"),
          "phonlineUniqueId" -> Seq("9"))),
        cnMatched = true, uidAmbiguous = false),
      // unchanged match (all attrs equal)
      MatchIn("bob", "7", None,
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"))),
        cnMatched = true, uidAmbiguous = false),
      // unchanged but sync-says-new → warning, no change
      MatchIn("bob", "7", None,
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = true, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"))),
        cnMatched = true, uidAmbiguous = false),
      // uid-mismatch warning overwrites should-be-new
      MatchIn("bob", "7", None,
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = true, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("8"))),
        cnMatched = true, uidAmbiguous = false),
      // old entry without any uid attr → "Got null" message
      MatchIn("bob", "7", None,
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")), Some(Map("cn" -> Seq("bob"))),
        cnMatched = true, uidAmbiguous = false),
      // rename: cn differs → new dn under old parent + renameOldCn
      MatchIn("bob2", "7", None,
        Map("cn" -> Seq("bob2"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"))),
        cnMatched = false, uidAmbiguous = false),
      // attribute delete: old has givenName, new does not
      MatchIn("bob", "7", None,
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"),
          "givenName" -> Seq("Bob"))),
        cnMatched = true, uidAmbiguous = false),
      // resurrection: idnDeleted cleared even with zero field diffs
      MatchIn("bob", "7", None,
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"),
          "idnDeleted" -> Seq("TRUE"))),
        cnMatched = true, uidAmbiguous = false),
      // password unchanged under the entry's stored IV → no update
      MatchIn("bob", "7", Some("secret"),
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"),
          "idnDistributionPassword" -> Seq(storedPw))),
        cnMatched = true, uidAmbiguous = false),
      // password changed → re-encrypt under configured IV + {CRYPT}
      MatchIn("bob", "7", Some("newpw"),
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"),
          "idnDistributionPassword" -> Seq(storedPw))),
        cnMatched = true, uidAmbiguous = false),
      // password dropped → attribute delete
      MatchIn("bob", "7", None,
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"),
          "idnDistributionPassword" -> Seq(storedPw))),
        cnMatched = true, uidAmbiguous = false),
      // stored pw too short to carry an IV → compare under configured IV
      MatchIn("bob", "7", Some("secret"),
        Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7")),
        isNew = false, Some(dn("bob")),
        Some(Map("cn" -> Seq("bob"), "phonlineUniqueId" -> Seq("7"),
          "idnDistributionPassword" -> Seq("deadbeef"))),
        cnMatched = true, uidAmbiguous = false),
      // add, sync agrees it's new, with password
      MatchIn("eve", "9", Some("pw1"),
        Map("cn" -> Seq("eve"), "phonlineUniqueId" -> Seq("9")),
        isNew = true, None, None, cnMatched = false, uidAmbiguous = false),
      // add, sync says it exists → warning
      MatchIn("eve", "9", None,
        Map("cn" -> Seq("eve"), "phonlineUniqueId" -> Seq("9")),
        isNew = false, None, None, cnMatched = false, uidAmbiguous = false))
    assertEquivalent(rows, "edge")
  }

  test("seeded random sweep matches the typed kernel") {
    val ldapKeys = EtlSchema.odbcToLdap.values
      .filterNot(_ == "idnDistributionPassword").toSeq.sorted
    val rnd = new scala.util.Random(1234)
    def attrs(uid: String): Map[String, Seq[String]] = {
      val ks = rnd.shuffle(ldapKeys).take(rnd.nextInt(6))
      val m = ks.map { k =>
        k -> (rnd.nextInt(4) match {
          case 0 => Seq("a")
          case 1 => Seq("b")
          case 2 => Seq("J  ")
          case _ => Seq("a", "b")
        })
      }.toMap
      m ++
        (if (rnd.nextBoolean())
          Map("phonlineUniqueId" ->
            Seq(if (rnd.nextBoolean()) uid else "999")) else Map.empty) ++
        (if (rnd.nextInt(4) == 0) Map("idnDeleted" -> Seq("TRUE")) else Map.empty) ++
        (if (rnd.nextBoolean()) Map("cn" -> Seq("cn" + rnd.nextInt(3))) else Map.empty) ++
        (if (rnd.nextInt(3) == 0)
          Map("idnDistributionPassword" -> Seq(storedPw)) else Map.empty)
    }
    val rows = (0 until 300).map { i =>
      val uid = rnd.nextInt(5).toString
      val cn = "u" + rnd.nextInt(6)
      val hasOld = rnd.nextBoolean()
      MatchIn(
        srcCn = cn, srcUid = uid,
        pwPlain = rnd.nextInt(3) match {
          case 0 => None
          case 1 => Some("secret")
          case _ => Some("pw" + rnd.nextInt(3))
        },
        newAttrs = attrs(uid) + ("cn" -> Seq(cn)),
        isNew = rnd.nextBoolean(),
        oldDn = if (hasOld) Some(dn("o" + rnd.nextInt(6))) else None,
        oldAttrs = if (hasOld) Some(attrs(uid)) else None,
        cnMatched = hasOld && rnd.nextBoolean(),
        uidAmbiguous = rnd.nextInt(10) == 0)
    }
    assertEquivalent(rows, "random")
    // same sweep under the ph15 conf: the notSyncedPh15 exclusion must
    // unroll identically (emailadresse_st never diffs, never deletes)
    assertEquivalent(rows, "random-ph15", conf15)
  }
}
