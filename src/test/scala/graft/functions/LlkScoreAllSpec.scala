package graft.functions

import graft.TestSpark
import graft.core.{Llk, Pfsa}
import org.scalatest.funsuite.AnyFunSuite

/** The native llk expression must be bit-identical to the Scala kernel and
  * actually participate in whole-stage codegen (the reason it exists). */
class LlkScoreAllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expression scores equal the direct kernel, codegen'd") {
    val lib = Seq(Pfsa.m2, Pfsa.m2u)
    // round-trip through parquet so ConvertToLocalRelation can't fold the
    // projection away — we want to SEE the expression in the executed plan
    val dir = java.nio.file.Files.createTempDirectory("llkexpr").toString
    Seq(
      (0L, Pfsa.m2.sample(500, seed = 1L).toSeq),
      (1L, Pfsa.m2u.sample(500, seed = 2L).toSeq),
      (2L, Seq.empty[Byte]))
      .toDF("seq_id", "symbols")
      .write.mode("overwrite").parquet(dir)
    val seqs = spark.read.parquet(dir)
    val scored = Llk.scoreAll(spark, seqs, lib)
    val got = scored.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for ((sid, syms) <- Seq(0L -> Pfsa.m2.sample(500, seed = 1L),
                            1L -> Pfsa.m2u.sample(500, seed = 2L),
                            2L -> Array.empty[Byte]);
         (m, ci) <- lib.zipWithIndex)
      assert(got((sid, ci)) == Llk.llk(syms, m),
        s"seq $sid model $ci diverged from the kernel")
    // the plan carries the native expression inside a codegen stage (the
    // "*(n)" prefix in the compact plan string), no UDF wrapper anywhere
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("llk_score_all"), plan)
    assert(!plan.contains("UDF"), plan)
    assert("""\*\(\d+\) Project \[.*llk_score_all""".r.findFirstIn(plan).isDefined,
      s"llk_score_all not inside a codegen'd Project:\n$plan")
  }

  test("type check rejects non-byte arrays") {
    val bad = Seq((0L, Seq(1, 2, 3))).toDF("seq_id", "symbols")
    val ex = intercept[Exception] {
      Llk.scoreAll(spark, bad, Seq(Pfsa.m2)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("llk_score_all")
      || ex.getMessage.toLowerCase.contains("tinyint"), ex.getMessage)
  }
}
