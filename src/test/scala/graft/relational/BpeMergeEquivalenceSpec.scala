package graft.relational

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The BPE gate rests on one equivalence claim: the Spark-side
  * `aggregate` FOLD (merge when the accumulator's last element is `l` and
  * the next is `r`), the textbook LEFT-TO-RIGHT SCAN (merge at i, skip
  * i+1, continue at i+2), and the oracle's RUN-PARITY rule (within each
  * maximal run of consecutive merge-eligible positions, even offsets
  * merge) all produce the same tokenization. This property spec pins all
  * three against each other over random token sequences and random pairs
  * — including the doubled-symbol runs where they could plausibly differ.
  */
class BpeMergeEquivalenceSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    graft.PropSampler.forAll(g, seedBase = 0xBEEFL, n = 500)(body)

  private def foldRule(toks: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    toks.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
      else out += x
    }
    out.toList
  }

  private def scanRule(toks: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toList
  }

  private def runParityRule(toks: List[String], l: String, r: String): List[String] = {
    val n = toks.length
    val elig = Array.tabulate(n)(i => i + 1 < n && toks(i) == l && toks(i + 1) == r)
    // run id = position - rank among eligible positions (constant per run)
    val doMerge = new Array[Boolean](n)
    var rank = 0
    val runOffset = scala.collection.mutable.Map.empty[Int, Int]
    for (i <- 0 until n if elig(i)) {
      rank += 1
      val runKey = i - rank
      val off = runOffset.getOrElse(runKey, 0)
      doMerge(i) = off % 2 == 0
      runOffset(runKey) = off + 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < n) {
      if (doMerge(i)) { out += (l + r); i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.toList
  }

  test("fold, scan, and run-parity merge rules agree on random inputs") {
    val tokGen = Gen.oneOf("a", "b", "c", "ab", "aa")
    val seqGen = Gen.listOfN(12, tokGen)
    val pairGen = for (l <- tokGen; r <- tokGen) yield (l, r)
    forAll(Gen.zip(seqGen, pairGen)) { case (toks, (l, r)) =>
      val f = foldRule(toks, l, r)
      val sc = scanRule(toks, l, r)
      val rp = runParityRule(toks, l, r)
      assert(f == sc, s"fold != scan for $toks merge ($l,$r): $f vs $sc")
      assert(sc == rp, s"scan != run-parity for $toks merge ($l,$r): $sc vs $rp")
      // and no characters are ever lost
      assert(f.mkString == toks.mkString)
    }
  }

  test("the known adversarial shapes agree") {
    for {
      toks <- Seq(
        List("a", "a", "a"), List("a", "a", "a", "a"),
        List("a", "a", "a", "a", "a"),
        List("a", "b", "a", "b", "a"), List("a", "b", "b"),
        List("aa", "a", "aa"), List("ab", "b", "ab", "b"))
      pair <- Seq(("a", "a"), ("a", "b"), ("b", "a"), ("aa", "a"), ("ab", "b"))
    } {
      val (l, r) = pair
      val f = foldRule(toks, l, r)
      assert(f == scanRule(toks, l, r) && f == runParityRule(toks, l, r),
        s"divergence on $toks merge ($l,$r)")
    }
  }
}
