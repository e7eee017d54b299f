package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Full sample-covariance matrix of a vector column in ONE pass, as a
  * [[TypedImperativeAggregate]] — the scale-correct alternative to the
  * explode-and-self-join formulation: materializing (i, j, xᵢ, xⱼ) rows
  * costs n·d² intermediate rows (a 4096× blow-up at d=64), while this
  * aggregate carries a fixed d(d+3)/2+1-double buffer (n, per-dimension
  * sums, upper-triangle product sums), updates it per row in d(d+1)/2
  * fused multiply-adds, COMBINES MAP-SIDE (each partition ships one
  * ~16 KiB buffer at d=64, independent of row count), and merges by plain
  * addition — the textbook mergeable-statistic shape, same family as the
  * HLL/quantile sketches in agg_distinct_sketch.
  *
  * Accepts `array<float>` or `array<double>` input (the embeddings
  * fixture stores float32; sums are always accumulated in float64). Rows
  * that are null or of length ≠ d are skipped, matching the SQL aggregate
  * null convention. `eval` emits the upper triangle as
  * `array<struct<i int, j int, cov double>>` with the algebraic
  * sample-covariance identity cov = (Pᵢⱼ − SᵢSⱼ/n)/(n−1) — the SAME
  * formula the DuckDB oracle states explicitly (never `covar_samp`, whose
  * stable-update accumulation would differ in low-order bits); callers
  * round before comparing. Fewer than 2 rows ⇒ empty array.
  */
case class CovMatrix(
    d: Int,
    vecExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovMatrix.Buffer] {

  require(d > 0, s"cov_matrix needs d > 0, got $d")

  override def children: Seq[Expression] = Seq(vecExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(CovMatrix.entryType, containsNull = false)
  override def prettyName: String = "cov_matrix"

  private lazy val elemIsFloat: Boolean = vecExpr.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = vecExpr.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cov_matrix expects array<float|double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): CovMatrix.Buffer = new CovMatrix.Buffer(d)

  override def update(buf: CovMatrix.Buffer, input: InternalRow): CovMatrix.Buffer = {
    val v = vecExpr.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == d) {
        val x = new Array[Double](d)
        var i = 0
        while (i < d) {
          x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
        buf.add(x)
      }
    }
    buf
  }

  override def merge(buf: CovMatrix.Buffer, other: CovMatrix.Buffer): CovMatrix.Buffer = {
    buf.addAll(other); buf
  }

  override def eval(buf: CovMatrix.Buffer): Any = {
    if (buf.n < 2) return new GenericArrayData(Array.empty[Any])
    val n = buf.n.toDouble
    val out = new Array[Any](d * (d + 1) / 2)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = (buf.prods(k) - buf.sums(i) * buf.sums(j) / n) / (n - 1.0)
        out(k) = new GenericInternalRow(Array[Any](i, j, cov))
        j += 1; k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: CovMatrix.Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CovMatrix.Buffer =
    CovMatrix.Buffer.fromBytes(bytes, d)

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CovMatrix =
    copy(vecExpr = newChildren(0))
}

object CovMatrix {
  val entryType: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("cov", DoubleType, nullable = false)))

  /** n + per-dim sums + upper-triangle product sums; merge is addition. */
  final class Buffer(val d: Int) {
    var n: Long = 0L
    val sums: Array[Double] = new Array[Double](d)
    val prods: Array[Double] = new Array[Double](d * (d + 1) / 2)

    def add(x: Array[Double]): Unit = {
      n += 1
      var k = 0
      var i = 0
      while (i < d) {
        sums(i) += x(i)
        var j = i
        while (j < d) { prods(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
    }

    def addAll(o: Buffer): Unit = {
      n += o.n
      var i = 0
      while (i < d) { sums(i) += o.sums(i); i += 1 }
      var k = 0
      while (k < prods.length) { prods(k) += o.prods(k); k += 1 }
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(n)
      sums.foreach(out.writeDouble)
      prods.foreach(out.writeDouble)
      out.flush(); bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte], d: Int): Buffer = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val b = new Buffer(d)
      b.n = in.readLong()
      var i = 0
      while (i < d) { b.sums(i) = in.readDouble(); i += 1 }
      var k = 0
      while (k < b.prods.length) { b.prods(k) = in.readDouble(); k += 1 }
      b
    }
  }
}
