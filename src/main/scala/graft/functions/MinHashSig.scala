package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle array as a NATIVE codegen expression —
  * md5-parity values (identical to the composed
  * `aggregate(transform(...md5...), ..., zip_with(least...))` form, which
  * the DuckDB oracle replays): base hash = first 4 bytes of md5 of the
  * shingle's UTF-8 bytes, permutations hᵢ(x) = (aᵢ·(x mod P) + bᵢ) mod P
  * with P = 2³¹−1 and [[graft.text.TextOps.minhashCoeffs]] coefficients.
  *
  * Why native (r10): the HOF form interprets ~numHashes·|shingles| lambda
  * evaluations per row and the relational explode + 64-min-aggregate form
  * pays an extra corpus-sized exchange; this runs ONE digest per shingle
  * and a JIT'd min loop inside whole-stage codegen — the retired ScalaUDF's
  * cost without its serialization boundary or its JVM-private hash. */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  private val (as, bs) = graft.text.TextOps.minhashCoeffs(numHashes)
  // plain arrays for the hot loop (and Java-serializable with the task)
  private val aArr: Array[Long] = as.toArray
  private val bArr: Array[Long] = bs.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  /** One digest per shingle, running elementwise min. Empty input yields
    * the fold's init (all P) — matching the composed form's
    * `array_repeat(P, n)` zero. */
  def compute(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = Array.fill(numHashes)(graft.text.TextOps.MinhashP)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val d = md.digest(arr.getUTF8String(j).getBytes) // resets per call
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val hm = h % graft.text.TextOps.MinhashP
        var i = 0
        while (i < numHashes) {
          val v = (aArr(i) * hm + bArr(i)) % graft.text.TextOps.MinhashP
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhSig", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array as a NATIVE codegen expression —
  * md5-parity (token hash = big-endian first 8 bytes of md5, the value the
  * DuckDB oracle recomputes as `('0x' || substr(md5(t), 1, 16))::UBIGINT`):
  * each token votes ±1 per bit, code bit i set on positive majority.
  * Tokenless rows code to 0. Same rationale as [[MinHashSig]]: one digest
  * per token in a JIT'd loop beats both the interpreted-HOF and the
  * explode + 64-sum-aggregate (extra exchange) forms. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def compute(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val d = md.digest(arr.getUTF8String(j).getBytes)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shSig", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
