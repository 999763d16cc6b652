package graft.tools

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import graft.etl.Directory
import graft.etl.Directory.Entry

/** Ordered full-tree compare (reference ldaptest.py:301–352, J4 +
  * T1–T3): the reference co-iterates two sorted DN streams with a
  * hand-rolled merge; here it is one full-outer join on `short_dn` plus
  * row-local attribute set algebra, emitted in DFS order with the same
  * line format.
  */
object Compare {

  /** Volatile/engine-managed attrs excluded from comparison
    * (ldaptest.py:172–189).
    */
  val compareIgnore: Set[String] = Set(
    "objectClass", "ACL", "DirXML-Associations", "passwordUniqueRequired",
    "DirXML-PasswordSyncStatus", "DirXML-ADContext", "passwordMinimumLength",
    "DirXML-ADAliasName", "nspmDistributionPassword", "passwordAllowChange",
    "passwordRequired", "etdTimestamp", "etlTimestamp",
    "idnDistributionPassword", "userPassword", "patchlevel")

  /** Canonicalizers applied before comparing (ldaptest.py:164–170). */
  private def fixup(attr: String, v: Seq[String]): Seq[String] =
    if (attr == "phonlineBenutzergruppe")
      v.map(x => x.split(";").sorted.mkString(";"))
    else v

  private def pyRepr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def reprVal(attr: String, v: Seq[String]): String =
    if (Directory.listReprAttrs.contains(attr))
      v.map(pyRepr).mkString("[", ", ", "]")
    else if (v.size == 1) v.head
    else v.map(pyRepr).mkString("[", ", ", "]")

  /** String twin of ConvertF.shortDn (same ","+base-strip semantics,
    * reference ldaptest.py:142–146) — keep the two in lockstep.
    */
  private def shortDn(dn: String, base: String): String =
    dn.stripSuffix("," + base).toLowerCase

  /** Row-local diff of one matched pair — the whole compare semantics
    * minus the join/order, shared by the distributed and the collecting
    * form.
    */
  private def diffLines(pair: (Option[Entry], Option[Entry])): Seq[String] =
    pair match {
      case (Some(a), None) => Seq(s"Only in lhs: ${a.dn}")
      case (None, Some(b)) => Seq(s"Only in rhs: ${b.dn}")
      case (Some(a), Some(b)) =>
        val x1a = a.attrs.keySet -- compareIgnore
        val x2a = b.attrs.keySet -- compareIgnore
        val onlyL =
          if ((x1a -- x2a).nonEmpty)
            Seq(s"Attributes of ${a.dn} only in lhs: " +
              (x1a -- x2a).toSeq.sorted.map(pyRepr).mkString("[", ", ", "]"))
          else Nil
        val onlyR =
          if ((x2a -- x1a).nonEmpty)
            Seq(s"Attributes of ${b.dn} only in rhs: " +
              (x2a -- x1a).toSeq.sorted.map(pyRepr).mkString("[", ", ", "]"))
          else Nil
        val diffs = (x1a & x2a).toSeq.sorted.flatMap { at =>
          val v1 = fixup(at, a.attrs(at))
          val v2 = fixup(at, b.attrs(at))
          if (v1 != v2)
            Seq(s"Differs: ${a.dn} $at: " +
              s"(${reprVal(at, v1)} vs ${reprVal(at, v2)})")
          else Nil
        }
        onlyL ++ onlyR ++ diffs
      case (None, None) => Nil
    }

  /** Distributed tree diff: full-outer join on short_dn, global range
    * sort on the DFS key, then a NARROW flatMap to diff lines — the
    * result is a Dataset ready for a sorted write (`.write.text`),
    * never materialized on the driver. Per-entry lines stay adjacent
    * (flatMap is per-row) and globally DFS-ordered (range partitioning
    * from the orderBy survives the narrow map). This is the J4 operator
    * at 100 TB; `compare` below is its collecting twin for golden
    * fixtures.
    */
  def compareDf(lhs: Dataset[Entry], rhs: Dataset[Entry],
      baseL: String, baseR: String): Dataset[String] = {
    val lKeyed = lhs.map(x => (shortDn(x.dn, baseL), x))(
      Encoders.product[(String, Entry)]).toDF("k", "l")
    val rKeyed = rhs.map(x => (shortDn(x.dn, baseR), x))(
      Encoders.product[(String, Entry)]).toDF("k", "r")
    lKeyed.join(rKeyed, Seq("k"), "full_outer")
      .withColumn("ord", Directory.dfsKey(
        coalesce(col("l.dn"), col("r.dn"))))
      .orderBy("ord")
      .select("l", "r")
      .as[(Option[Entry], Option[Entry])](
        Encoders.product[(Option[Entry], Option[Entry])])
      .flatMap(diffLines _)(Encoders.STRING)
  }

  /** Compare two trees; returns diff lines in DFS order (empty ⇒ equal).
    * Driver-side golden-fixture formatter — the distributed form is
    * `compareDf`.
    */
  def compare(lhs: Dataset[Entry], rhs: Dataset[Entry],
      baseL: String, baseR: String): Seq[String] =
    compareDf(lhs, rhs, baseL, baseR).collect().toSeq
}
