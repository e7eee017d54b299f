package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of an `array<double>` column with a CONSTANT weight vector
  * as a NATIVE codegen expression — the [[VecDot]] kernel specialized for
  * plan-time weights (LSH hyperplane signs, projection axes). The
  * composed form this replaces,
  * `aggregate(transform(v, (x, i) -> x * element_at(lit(w), i+1)), 0D, +)`,
  * interprets two lambdas per element AND bakes the weights in as a
  * typedLit array that bloats the generated code (the r9 graph build
  * trimmed its literal widths for exactly that janino reason); here the
  * weights ride as ONE referenced object and the fused loop runs inside
  * whole-stage codegen. The r10 measurement: the shared k-NN edge build
  * evaluates tables·bits of these per corpus row, and the HOF form was
  * the dominant term of graph_components' wall at the 10× fixture.
  *
  * Parity with the composed form: left-to-right fold (bit-identical fp),
  * a NULL element poisons the result to NULL, and a vector LONGER than
  * the weights yields NULL (element_at past the literal's end is NULL —
  * same poisoning); a SHORTER vector uses its own length (transform
  * iterates the vector). */
case class VecDotConst(child: Expression, weights: Array[Double])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_dot_const expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_const"

  def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    if (n > weights.length) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      sum += arr.getDouble(i) * weights(i)
      i += 1
    }
    sum
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $c.numElements();
         |if ($n > $w.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $c.getDouble($i) * $w[$i];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecDotConst =
    copy(child = newChild)
}
