package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType}

/** Native expression for GenESeSS's π̃ estimation sweep (tex/ms.tex:316-318):
  * runs a symbol array through its cluster's transition skeleton counting
  * (state, symbol) visits, returning a flat `array<long>` of |Q|·|Σ| counts.
  * Same codegen treatment as [[LlkScoreAll]] — the skeletons ride along as a
  * reference object, the kernel reads `ArrayData` directly. */
case class PfsaVisitCounts(
    left: Expression, right: Expression,
    connByCluster: Map[Int, Array[Array[Int]]], alphabetSize: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pfsa_visit_counts expects (int cluster, array<tinyint> symbols), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pfsa_visit_counts"

  override protected def nullSafeEval(cluster: Any, symbols: Any): Any =
    PfsaVisitCounts.compute(cluster.asInstanceOf[Int],
      symbols.asInstanceOf[ArrayData], connByCluster, alphabetSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conns = ctx.addReferenceObj("visitConns", connByCluster,
      "scala.collection.immutable.Map")
    nullSafeCodeGen(ctx, ev, (c, s) =>
      s"${ev.value} = graft.functions.PfsaVisitCounts.compute($c, $s, $conns, $alphabetSize);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PfsaVisitCounts =
    copy(left = newLeft, right = newRight)
}

object PfsaVisitCounts {
  def compute(cluster: Int, symbols: ArrayData,
              connByCluster: Map[Int, Array[Array[Int]]], k: Int): GenericArrayData = {
    val conn = connByCluster(cluster)
    val arr = symbols.toByteArray()
    val nq = conn.length
    val cnt = new Array[Long](nq * k)
    var q = 0
    var t = 0
    while (t < arr.length) {
      val s = arr(t).toInt
      if (s >= 0 && s < k) {
        cnt(q * k + s) += 1
        q = conn(q)(s)
      }
      t += 1
    }
    new GenericArrayData(cnt)
  }
}
