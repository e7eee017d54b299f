package graft.functions

import graft.core.{Llk, Pfsa}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native Catalyst expression for the llk kernel (reference Alg. 1,
  * tex/ms.tex:261-287): scores one symbol array against EVERY model in the
  * embedded library in a single call, returning `array<double>`.
  *
  * This is the SURVEY §4.2-item-1 upgrade path over the Scala UDF: the
  * expression participates in whole-stage codegen (no UDF wrapper, no
  * Catalyst↔Scala `Seq` conversion — it reads the `ArrayData` buffer
  * directly), so the scoring projection stays inside the generated loop.
  * The library rides along as a codegen reference object, the same KB-scale
  * payload the UDF closed over.
  *
  * Null symbols inside the array are not expected (quantizers never emit
  * them); a null ARRAY propagates null per UnaryExpression semantics.
  */
case class LlkScoreAll(child: Expression, library: Array[Pfsa])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"llk_score_all expects array<tinyint> symbols, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "llk_score_all"

  override protected def nullSafeEval(input: Any): Any =
    LlkScoreAll.compute(input.asInstanceOf[ArrayData], library)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lib = ctx.addReferenceObj("llkLibrary", library, "graft.core.Pfsa[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LlkScoreAll.compute($c, $lib);")
  }

  override protected def withNewChildInternal(newChild: Expression): LlkScoreAll =
    copy(child = newChild)
}

object LlkScoreAll {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(input: ArrayData, lib: Array[Pfsa]): GenericArrayData = {
    val symbols = input.toByteArray()
    val out = new Array[Double](lib.length)
    var i = 0
    while (i < lib.length) { out(i) = Llk.llk(symbols, lib(i)); i += 1 }
    new GenericArrayData(out)
  }
}
