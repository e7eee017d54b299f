package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic sample runner over a scalacheck `Gen` — the shared
  * property-test harness (no scalatestplus bridge in the offline cache).
  * Samples that fail to generate are skipped, which generators here never
  * do in practice; the fixed per-spec seed keeps failures reproducible. */
object PropSampler {
  def forAll[A](g: Gen[A], seedBase: Long, n: Int = 25)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(seedBase + i)).foreach(body)
    }
}
