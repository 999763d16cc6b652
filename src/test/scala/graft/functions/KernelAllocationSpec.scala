package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 kernel-internals pins. The optimization round rewrote the
  * MinHash/SimHash token loops onto an allocation-free path; these
  * tests pin the two semantic invariants the rewrite leaned on, at the
  * kernel level where a future edit would flip them silently:
  *
  *  - MinHash may hash DUPLICATE tokens (min is idempotent), so the
  *    signature of a duplicate-heavy array must equal the signature of
  *    its distinct form — the exact equivalence that let the per-row
  *    HashSet go.
  *  - SimHash must NOT count duplicates (votes are per DISTINCT
  *    token): a duplicated token must leave the hash unchanged vs the
  *    distinct form, and a genuinely repeated-vote hash would differ —
  *    the reason ITS seen-set stayed.
  */
class KernelAllocationSpec extends AnyFunSuite {

  private def arr(ws: String*): GenericArrayData =
    new GenericArrayData(ws.map(w =>
      if (w == null) null else UTF8String.fromString(w)).toArray[Any])

  test("minhash: duplicate tokens cannot change the signature") {
    val distinct = MinHashExpr.kernel(arr("alpha", "beta", "gamma"))
    val dups = MinHashExpr.kernel(
      arr("alpha", "beta", "alpha", "gamma", "beta", "alpha"))
    assert(distinct.toLongArray().toSeq == dups.toLongArray().toSeq)
  }

  test("minhash: null tokens are skipped, not hashed") {
    val a = MinHashExpr.kernel(arr("alpha", null, "beta"))
    val b = MinHashExpr.kernel(arr("alpha", "beta"))
    assert(a.toLongArray().toSeq == b.toLongArray().toSeq)
  }

  test("simhash: votes count distinct tokens exactly once") {
    val distinct = SimHashExpr.kernel(arr("alpha", "beta", "gamma"))
    val dups = SimHashExpr.kernel(
      arr("alpha", "beta", "alpha", "gamma", "beta", "alpha"))
    assert(distinct == dups)
    // and the set is doing real work: with one token absent the hash
    // moves (so the equality above cannot pass vacuously)
    assert(SimHashExpr.kernel(arr("alpha", "beta")) != distinct)
  }

  test("kernels are re-entrant across calls on one thread") {
    // the round-19 rewrite introduced per-thread digest state; two
    // back-to-back calls must not bleed into each other
    val once = MinHashExpr.kernel(arr("alpha")).toLongArray().toSeq
    MinHashExpr.kernel(arr("zeta", "eta", "theta"))
    assert(MinHashExpr.kernel(arr("alpha")).toLongArray().toSeq == once)
    val s1 = SimHashExpr.kernel(arr("alpha"))
    SimHashExpr.kernel(arr("zeta", "eta", "theta"))
    assert(SimHashExpr.kernel(arr("alpha")) == s1)
  }
}
