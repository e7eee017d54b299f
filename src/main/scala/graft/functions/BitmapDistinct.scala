package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.roaringbitmap.longlong.Roaring64Bitmap

/** EXACT distinct counting over int64 ids as a mergeable ROARING-BITMAP
  * [[TypedImperativeAggregate]] — the third point on the distinct-count
  * design space the engine now covers end-to-end: `count(distinct)`
  * re-shuffles the raw ids (exact, expensive), the DataSketches HLL path
  * (agg_distinct_sketch / agg_sketch_merge) is cheap but approximate,
  * and this aggregate is BOTH exact and mergeable — compressed bitmap
  * state per group, map-side combine (each partition ships one bitmap,
  * never ids), merge by bitwise OR, which is associative and idempotent
  * (re-merging a retried partition cannot double-count, the property
  * that makes bitmap stores the warehouse standard for exact audience
  * counts). Dense id spaces compress to ~bits/row; the worst case is
  * bounded by the id universe, not the row count — the practical trade
  * vs HLL's fixed 2^lgK registers is exactness for value-distribution-
  * dependent state size (RoaringBitmap 1.3, already on Spark's own
  * classpath — Spark uses it for shuffle tracking). Null ids are skipped
  * per SQL aggregate convention. */
case class BitmapDistinct(
    idExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def checkInputDataTypes(): TypeCheckResult = idExpr.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct expects a bigint id, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = idExpr.eval(input)
    if (v != null) buf.addLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buf.or(other)
    buf
  }

  override def eval(buf: Roaring64Bitmap): Any = buf.getLongCardinality

  override def serialize(buf: Roaring64Bitmap): Array[Byte] = {
    buf.runOptimize() // RLE-compress runs before shipping the partial
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.serialize(out)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(idExpr = newChildren(0))
}
