package graft.core

import org.scalatest.funsuite.AnyFunSuite

class PfsaSpec extends AnyFunSuite {

  test("stationary distribution of M2 solves pM = p") {
    val p = Pfsa.m2.stationary
    // M2: δ(q,σ)=σ so M = pitilde; solve by hand: p0 = p0·.6 + p1·.3
    // → p0 = 3/7, p1 = 4/7
    assert(math.abs(p(0) - 3.0 / 7) < 1e-9)
    assert(math.abs(p(1) - 4.0 / 7) < 1e-9)
    assert(math.abs(p.sum - 1.0) < 1e-9)
  }

  test("entropy rate of a fair-coin machine is 1 bit") {
    val fair = Pfsa(Array(Array(0, 0)), Array(Array(0.5, 0.5)), Array(0.5, 0.5))
    assert(math.abs(fair.entropyRate - 1.0) < 1e-12)
  }

  test("sample respects emission bias and is deterministic under a seed") {
    val biased = Pfsa(Array(Array(0, 0)), Array(Array(0.9, 0.1)), Array(0.9, 0.1))
    val s1 = biased.sample(20000, seed = 7)
    val s2 = biased.sample(20000, seed = 7)
    assert(s1.sameElements(s2))
    val frac1 = s1.count(_ == 1).toDouble / s1.length
    assert(math.abs(frac1 - 0.1) < 0.01)
  }

  test("text codec round-trips (reference M2.cfg shape)") {
    val m = Pfsa.m2.copy(annErr = 0.01, mrgEps = 0.1, synStr = Some(Seq(0, 1)))
    val back = Pfsa.fromText(m.toText)
    assert(back.conn.map(_.toSeq).toSeq == m.conn.map(_.toSeq).toSeq)
    val flatBack = back.pitilde.flatMap(_.toSeq).toSeq
    val flatOrig = m.pitilde.flatMap(_.toSeq).toSeq
    assert(flatBack.zip(flatOrig).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(back.synStr.contains(Seq(0, 1)))
    assert(back.annErr == 0.01)
  }
}
