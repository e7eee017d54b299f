package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH codes of an `array<float>` embedding as a NATIVE
  * codegen expression (r10, retiring the corpus-side `hyperplaneUdf`):
  * one `bits`-bit sign code per table, bit b of table t = sign of the
  * dot product against plane (t, b). The Gaussian planes ride as ONE
  * referenced object into generated code; values are bit-identical to
  * the retired UDF (same ascending-index dot fold, same float→double
  * widening, `min(dim, len)` truncation), so the ANN family's in-query
  * recall grids and candidate counts are unchanged. This is the
  * corpus-side coding pass of similarity_ann / dedup_embedding — the
  * one leg of the LSH pipeline that scales with N. */
case class HyperplaneCodes(child: Expression, planes: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_codes expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_codes"

  def compute(arr: ArrayData): Any = {
    val tables = planes.length
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val tp = planes(t)
      var code = 0L
      var b = 0
      while (b < tp.length) {
        val p = tp(b)
        val n = math.min(p.length, arr.numElements())
        var dot = 0.0
        var i = 0
        while (i < n) {
          if (arr.isNullAt(i)) return null
          dot += p(i) * arr.getFloat(i)
          i += 1
        }
        if (dot >= 0) code |= (1L << b)
        b += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpCodes", this, classOf[HyperplaneCodes].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("codes")
      s"""
         |Object $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCodes =
    copy(child = newChild)
}
