package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency probe of a pre-merged Count-Min sketch as a NATIVE
  * codegen expression (r9 verdict ask #6 — the previous ScalaUDF probe
  * forced every row of agg_count_min's per-user frame through the
  * serialization boundary). The sketch rides into the plan as a
  * referenced object (the same mechanism Spark's own
  * BloomFilterMightContain uses for its build side): deserialized once
  * per executor with task broadcast, probed inline in generated code. */
case class CmsEstimate(child: Expression, sketch: CountMinSketch)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects a bigint key, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(v: Any): Any =
    sketch.estimateCount(java.lang.Long.valueOf(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", sketch, classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimateCount(java.lang.Long.valueOf($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
