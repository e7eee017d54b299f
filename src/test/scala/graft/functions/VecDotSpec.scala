package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** The native dot-product kernel: bit-parity with the composed
  * zip_with+aggregate fold it replaced (the property every oracle hash
  * depends on), the null/length edge semantics, and the codegen path
  * actually engaging (no CodegenFallback wrapper in the plan).
  */
class VecDotSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def vd = (a: String, b: String) =>
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(col(a)), ColumnBridge.expression(col(b))))
  private def hof(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (p, q) -> p * q), 0D, (acc, v) -> acc + v)")

  test("bit-parity with the composed HOF fold on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(vd("a", "b").as("native"), hof("a", "b").as("composed"))
    df.collect().foreach { r =>
      // BIT equality, not approximate: same sequential fold
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null semantics match zip_with: null element, length mismatch, null array") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),  // 11.0
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))),       // null elem
      (Some(Seq(Some(1.0))), Some(Seq(Some(3.0), Some(4.0)))),             // length mismatch
      (None, Some(Seq(Some(3.0))))                                          // null array
    ).toDF("a", "b")
      .select(vd("a", "b").as("native"), hof("a", "b").as("composed"))
    val got = df.collect()
    assert(got(0).getDouble(0) === 11.0 && got(0).getDouble(1) === 11.0)
    (1 to 3).foreach { i =>
      assert(got(i).isNullAt(0) === got(i).isNullAt(1), s"row $i null parity")
      assert(got(i).isNullAt(0), s"row $i must be null")
    }
    // empty arrays: the fold's zero
    val e = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(vd("a", "b")).head
    assert(e.getDouble(0) === 0.0)
  }

  test("whole-stage codegen engages over a real scan (the kernel is not a fallback)") {
    // a local Seq would constant-fold into a LocalTableScan; a parquet
    // scan forces the projection through the codegen pipeline
    val emb = graft.relational.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("a"))
      .withColumn("b", col("a"))
    val native = emb.select(vd("a", "b").as("d"))
    val composed = emb.select(hof("a", "b").as("d"))
    // the native kernel stays inside the codegen'd projection ("*(n)");
    // the composed HOF form is CodegenFallback and BREAKS its projection
    // out of the span — the measured ~20x on the N^2 edge build
    val nPlan = native.queryExecution.executedPlan.toString
    assert(nPlan.linesIterator.exists(l => l.contains("*(") && l.contains("vec_dot")),
      s"vec_dot projection must carry the codegen star:\n$nPlan")
    val cPlan = composed.queryExecution.executedPlan.toString
    assert(cPlan.linesIterator.exists(l => l.contains("aggregate(") && !l.contains("*(")),
      s"(sanity) the HOF form is expected to fall out of codegen:\n$cPlan")
    val a = native.collect().map(_.getDouble(0))
    val b = composed.collect().map(_.getDouble(0))
    a.zip(b).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToRawLongBits(x) ===
        java.lang.Double.doubleToRawLongBits(y),
        "self-dot parity through the codegen path")
      assert(x >= 0.0)
    }
  }
}
