package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case pins for the r10 native signature expressions — the corners
  * a fixture never exercises: empty inputs, null elements, null rows,
  * mismatched signature widths. */
class SigExprEdgeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._
  import graft.text.TextOps

  test("MinHashSig: empty shingle set folds to the all-P init; null row stays null") {
    val df = Seq(
      (0L, Some(Seq.empty[String])),
      (1L, Some(Seq("abcde"))),
      (2L, Option.empty[Seq[String]])
    ).toDF("id", "sh")
    val rows = df.select(col("id"), TextOps.minhashSigCol(col("sh"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(0L).get.asInstanceOf[scala.collection.Seq[Long]].toSeq ==
      Seq.fill(8)(TextOps.MinhashP), "empty fold must equal the composed init")
    assert(rows(1L).get.asInstanceOf[scala.collection.Seq[Long]].forall(_ < TextOps.MinhashP))
    assert(rows(2L).isEmpty, "null input must stay null")
  }

  test("MinHashSig: a null shingle contributes nothing (matches transform+aggregate null skip)") {
    val withNull = Seq((0L, Seq[String]("abcde", null, "fghij"))).toDF("id", "sh")
    val clean = Seq((0L, Seq("abcde", "fghij"))).toDF("id", "sh")
    val a = withNull.select(TextOps.minhashSigCol(col("sh"), 16)).head().getSeq[Long](0)
    val b = clean.select(TextOps.minhashSigCol(col("sh"), 16)).head().getSeq[Long](0)
    assert(a == b)
  }

  test("SimHash64: tokenless row codes to 0; null row stays null") {
    val df = Seq(
      (0L, Some(Seq.empty[String])),
      (1L, Option.empty[Seq[String]]),
      (2L, Some(Seq("alpha")))
    ).toDF("id", "toks")
    val rows = df.select(col("id"), TextOps.simhashCol(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(0L).contains(0L))
    assert(rows(1L).isEmpty)
    assert(rows(2L).exists(_ != 0L))
  }

  test("SigAgree: mismatched widths count over the shorter prefix, like the retired UDF") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L))).toDF("a", "b")
    assert(df.select(TextOps.sigAgree(col("a"), col("b"))).head().getInt(0) == 2)
  }
}
