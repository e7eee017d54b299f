package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Properties from reference tex/ms.tex Thm 1 (157-164): the negative mean
  * log-likelihood of G-generated data scored on G converges to H(G), and is
  * minimized at G among distinct machines. */
class LlkSpec extends AnyFunSuite {

  test("llk of self-generated data converges to the entropy rate") {
    val g = Pfsa.m2
    val data = g.sample(100000, seed = 1)
    val v = Llk.llk(data, g)
    assert(math.abs(v - g.entropyRate) < 0.02, s"llk $v vs H ${g.entropyRate}")
  }

  test("generator scores better than a distinct machine") {
    val data = Pfsa.m2.sample(50000, seed = 2)
    assert(Llk.llk(data, Pfsa.m2) < Llk.llk(data, Pfsa.m2u))
    val dataU = Pfsa.m2u.sample(50000, seed = 3)
    assert(Llk.llk(dataU, Pfsa.m2u) < Llk.llk(dataU, Pfsa.m2))
  }

  test("out-of-alphabet symbol gives +infinity (alphabet-compat semantics)") {
    assert(Llk.llk(Array[Byte](0, 1, 2), Pfsa.m2).isPosInfinity)
  }

  test("empty sequence scores 0") {
    assert(Llk.llk(Array.empty[Byte], Pfsa.m2) == 0.0)
  }

  test("scoreAll emits the long cluster_llks matrix") {
    val spark = TestSpark.spark
    import spark.implicits._
    val seqs = Seq(
      (0L, Pfsa.m2.sample(5000, 4).toSeq),
      (1L, Pfsa.m2u.sample(5000, 5).toSeq)).toDF("seq_id", "symbols")
    val out = Llk.scoreAll(spark, seqs, Seq(Pfsa.m2, Pfsa.m2u))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.size == 4)
    assert(out((0L, 0)) < out((0L, 1))) // m2 data explained best by m2
    assert(out((1L, 1)) < out((1L, 0))) // m2u data by m2u
  }
}
