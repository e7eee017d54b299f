package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row argmax-cosine against a CONSTANT benchmark matrix, as a NATIVE
  * codegen expression: for one corpus `array<double>` embedding, return
  * `struct(bid, cosine)` — the benchmark vector with the highest ROUNDED
  * (6 dp) cosine, ties to the smaller benchmark id. This is the
  * stream-deployable form of dedup_embedding_decontaminate's
  * `crossJoin(broadcast(bench)) → max(struct(round(cosine, 6), -bid))`:
  * a streaming aggregation would be STATEFUL, but folding the fixed-size
  * benchmark side into one per-row expression keeps the ingest screen a
  * stateless projection (zero state operators), while the per-pair
  * arithmetic is BIT-identical to the batch plan:
  *
  *  - cosine = dot(be, emb) / (sqrt(dot(be, be)) * sqrt(dot(emb, emb)))
  *    with [[VecDot]]'s left-to-right fold (the bench self-norm sqrt is
  *    precomputed per benchmark vector — same bits, IEEE multiplication
  *    is commutative);
  *  - a length mismatch or NULL element (VecDot → NULL) and a zero/NaN
  *    denominator (try_divide/nanvl) pin the pair to −1, exactly
  *    [[graft.text.Similarity.cosine]]'s guard chain;
  *  - rounding replicates Spark's `Round(_, 6)` on doubles: NaN/Inf pass
  *    through, else `BigDecimal.valueOf(c).setScale(6, HALF_UP)`;
  *  - the argmax compares ROUNDED values (two raw cosines that round
  *    equal tie-break by id, as the batch struct-max does). The
  *    BigDecimal rounding only runs for pairs within 1e-6 of the current
  *    best (rounding moves a value < 5e-7, so anything further behind
  *    can neither win nor tie) — the hot loop stays allocation-free.
  *
  * A NULL input array replicates the batch pin exactly (r15 advice): in
  * the crossJoin plan a NULL corpus embedding pins EVERY pair's cosine to
  * −1 (the coalesce guard), so the struct-max reports the smallest
  * benchmark id with cosine −1.0 (⇒ contaminated = false). The kernel
  * returns that same `struct(min(bid), -1.0)` rather than NULL, in both
  * the interpreted and codegen paths. NULL only for an empty benchmark
  * matrix. */
case class BestPartnerConst(child: Expression,
                            benchIds: Array[Long],
                            benchVecs: Array[Array[Double]])
  extends UnaryExpression {

  // sqrt of each benchmark vector's self-dot, precomputed once (same
  // left-to-right fold as VecDot over (be, be))
  private lazy val benchNormSqrt: Array[Double] = benchVecs.map { v =>
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"best_partner_const expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("bid", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "best_partner_const"

  // the batch pin for a NULL corpus embedding: every pair's cosine is -1,
  // so the struct-max lands on the smallest benchmark id at -1.0
  private lazy val nullPin: InternalRow =
    InternalRow(if (benchIds.isEmpty) 0L else benchIds.min, -1.0)

  override def eval(input: InternalRow): Any = {
    if (benchIds.isEmpty) return null
    val v = child.eval(input)
    if (v == null) nullPin else nullSafeEval(v)
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (benchIds.isEmpty) return null
    val n = arr.numElements()
    // extract once; a NULL element pins EVERY pair to -1 (VecDot null)
    var hasNull = false
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true else x(i) = arr.getDouble(i)
      i += 1
    }
    var selfDot = 0.0
    i = 0
    while (i < n) { selfDot += x(i) * x(i); i += 1 }
    val selfSqrt = math.sqrt(selfDot)
    var found = false
    var bestR = 0.0
    var bestB = 0L
    var j = 0
    while (j < benchIds.length) {
      val c = pairCosine(x, n, hasNull, selfSqrt, j)
      if (!found || c > bestR - 1e-6) {
        val r = roundLikeSpark(c)
        if (!found || r > bestR || (r == bestR && benchIds(j) < bestB)) {
          found = true; bestR = r; bestB = benchIds(j)
        }
      }
      j += 1
    }
    InternalRow(bestB, bestR)
  }

  private def pairCosine(x: Array[Double], n: Int, hasNull: Boolean,
                         selfSqrt: Double, j: Int): Double = {
    val be = benchVecs(j)
    if (hasNull || be.length != n) return -1.0
    var dot = 0.0
    var i = 0
    while (i < n) { dot += be(i) * x(i); i += 1 }
    val denom = benchNormSqrt(j) * selfSqrt
    val c = dot / denom // 0/0 and x/0 both yield NaN/Inf, pinned below
    if (java.lang.Double.isNaN(c) || java.lang.Double.isInfinite(c)) -1.0
    else c
  }

  private def roundLikeSpark(c: Double): Double =
    if (java.lang.Double.isNaN(c) || java.lang.Double.isInfinite(c)) c
    else java.math.BigDecimal.valueOf(c)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("benchIds", benchIds, "long[]")
    val vecs = ctx.addReferenceObj("benchVecs", benchVecs, "double[][]")
    val norms = ctx.addReferenceObj("benchNormSqrt", benchNormSqrt, "double[]")
    val childGen = child.genCode(ctx)
    val a = childGen.value
    val body = {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val hasNull = ctx.freshName("hasNull")
      val selfSqrt = ctx.freshName("selfSqrt")
      val found = ctx.freshName("found")
      val bestR = ctx.freshName("bestR")
      val bestB = ctx.freshName("bestB")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val r = ctx.freshName("r")
      val be = ctx.freshName("be")
      val dot = ctx.freshName("dot")
      val sd = ctx.freshName("sd")
      s"""
         |  final int $n = $a.numElements();
         |  boolean $hasNull = false;
         |  final double[] $x = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) $hasNull = true; else $x[$i] = $a.getDouble($i);
         |  }
         |  double $sd = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $sd += $x[$i] * $x[$i]; }
         |  final double $selfSqrt = Math.sqrt($sd);
         |  boolean $found = false;
         |  double $bestR = 0.0;
         |  long $bestB = 0L;
         |  for (int $j = 0; $j < $ids.length; $j++) {
         |    final double[] $be = $vecs[$j];
         |    double $c;
         |    if ($hasNull || $be.length != $n) {
         |      $c = -1.0;
         |    } else {
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $n; $i++) { $dot += $be[$i] * $x[$i]; }
         |      $c = $dot / ($norms[$j] * $selfSqrt);
         |      if (Double.isNaN($c) || Double.isInfinite($c)) $c = -1.0;
         |    }
         |    if (!$found || $c > $bestR - 1e-6) {
         |      final double $r = (Double.isNaN($c) || Double.isInfinite($c))
         |        ? $c
         |        : java.math.BigDecimal.valueOf($c)
         |            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |      if (!$found || $r > $bestR || ($r == $bestR && $ids[$j] < $bestB)) {
         |        $found = true; $bestR = $r; $bestB = $ids[$j];
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$bestB, $bestR});
       """.stripMargin
    }
    // hand-rolled null handling (vs nullSafeCodeGen): a NULL child must
    // produce the batch pin struct, not a NULL result — mirrors eval above
    val minBid = if (benchIds.isEmpty) 0L else benchIds.min
    val javaT = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ($ids.length == 0);
         |$javaT ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  if (${childGen.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{${minBid}L, -1.0});
         |  } else {
         |${body}
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BestPartnerConst =
    copy(child = newChild)

  // the reference arrays are value-equal across copies but Array.equals is
  // identity — compare contents so plan canonicalization/dedup stays sane
  override def equals(o: Any): Boolean = o match {
    case b: BestPartnerConst =>
      child == b.child && java.util.Arrays.equals(benchIds, b.benchIds) &&
        benchVecs.length == b.benchVecs.length &&
        benchVecs.indices.forall(i =>
          java.util.Arrays.equals(benchVecs(i), b.benchVecs(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(benchIds)
}
