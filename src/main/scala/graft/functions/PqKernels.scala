package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels as NATIVE codegen expressions (r10,
  * retiring the corpus-side PQ/IVFPQ ScalaUDFs in
  * [[graft.text.Similarity]]): codebooks/centers ride as referenced
  * objects in the plan, every loop is the retired UDF's loop verbatim
  * (identical operation order ⇒ bit-identical values ⇒ every recall
  * grid unchanged), and the per-row work fuses into whole-stage codegen
  * instead of crossing a serialization boundary on the corpus scan.
  * Query-side kernels (per-query ADC tables, cell probes) stay as UDFs —
  * they run on bounded probe rows, never the corpus. */
object PqKernels {
  private[functions] def genCall(ctx: CodegenContext, ev: ExprCode,
                                 ref: String, args: String,
                                 resultJava: String): String = {
    val tmp = ctx.freshName("res")
    s"""
       |Object $tmp = $ref.compute($args);
       |if ($tmp == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ($resultJava) $tmp; }
     """.stripMargin
  }
}

/** Per-subspace argmin encode: embedding (array<float>, or array<double>
  * for IVFPQ residuals) → array<int> code word. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  // lazy: at construction the child is still an UnresolvedAttribute and
  // dataType would throw — resolution happens before any eval/codegen
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  def compute(arr: ArrayData): Any = {
    val m = codebooks.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        val off = s * c.length
        var d = 0.0
        var i = 0
        while (i < c.length) {
          val x = if (isFloat) arr.getFloat(off + i).toDouble else arr.getDouble(off + i)
          val t = c(i) - x
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => PqKernels.genCall(ctx, ev, ref, c,
      "org.apache.spark.sql.catalyst.util.ArrayData"))
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Reconstructed vector norm from a plain-PQ code word:
  * √(Σ_s |cb_s(code_s)|²) — the retired `normUdf`. */
case class PqReconNorm(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_recon_norm expects array<int>, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_recon_norm"

  def compute(codes: ArrayData): Any = {
    var n2 = 0.0
    var s = 0
    while (s < codebooks.length) {
      val c = codebooks(s)(codes.getInt(s))
      var i = 0
      while (i < c.length) { n2 += c(i) * c(i); i += 1 }
      s += 1
    }
    math.sqrt(n2)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNorm", this, classOf[PqReconNorm].getName)
    defineCodeGen(ctx, ev, c => s"((java.lang.Double) $ref.compute($c)).doubleValue()")
  }
  override protected def withNewChildInternal(newChild: Expression): PqReconNorm =
    copy(child = newChild)
}

/** ADC lookup sum: Σ_s tbl[s·k + code_s] — the retired `adcUdf`. */
case class PqAdc(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<double>, array<int>), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  def compute(tbl: ArrayData, codes: ArrayData): Any = {
    var ip = 0.0
    var s = 0
    val n = codes.numElements()
    while (s < n) { ip += tbl.getDouble(s * k + codes.getInt(s)); s += 1 }
    ip
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    defineCodeGen(ctx, ev, (a, b) =>
      s"((java.lang.Double) $ref.compute($a, $b)).doubleValue()")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** IVF residual: embedding − center(cell) — the retired `residualUdf`. */
case class CellResidual(left: Expression, right: Expression,
                        centers: Array[Array[Double]])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cell_residual expects (array<float>, int), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cell_residual"

  def compute(emb: ArrayData, cell: Int): Any = {
    val c = centers(cell)
    val out = new Array[Double](c.length)
    var i = 0
    while (i < c.length) { out(i) = emb.getFloat(i).toDouble - c(i); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellRes", this, classOf[CellResidual].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => PqKernels.genCall(ctx, ev, ref, s"$a, $b",
      "org.apache.spark.sql.catalyst.util.ArrayData"))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellResidual =
    copy(left = newLeft, right = newRight)
}

/** Reconstructed |x̃| for IVFPQ: |c|² + Σ_s (|r̃_s|² + 2·<c_s, r̃_s>),
  * clamped at 0 before the sqrt — the retired `xnUdf`. */
case class IvfPqNorm(left: Expression, right: Expression,
                     centers: Array[Array[Double]],
                     codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ivfpq_norm expects (int, array<int>), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ivfpq_norm"

  def compute(cell: Int, codes: ArrayData): Any = {
    val c = centers(cell)
    var n2 = 0.0
    var i = 0
    while (i < c.length) { n2 += c(i) * c(i); i += 1 }
    var s = 0
    while (s < codebooks.length) {
      val e = codebooks(s)(codes.getInt(s))
      val off = s * e.length
      var j = 0
      while (j < e.length) { n2 += e(j) * e(j) + 2.0 * c(off + j) * e(j); j += 1 }
      s += 1
    }
    math.sqrt(math.max(n2, 0.0))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Int], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfpqNorm", this, classOf[IvfPqNorm].getName)
    defineCodeGen(ctx, ev, (a, b) =>
      s"((java.lang.Double) $ref.compute($a, $b)).doubleValue()")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfPqNorm =
    copy(left = newLeft, right = newRight)
}
