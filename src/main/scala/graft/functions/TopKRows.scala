package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k rows per group as a [[TypedImperativeAggregate]] — the
  * scale-safe alternative to `row_number() OVER (PARTITION BY key ORDER BY
  * value DESC) <= k` when the key is LOW-CARDINALITY: the window form
  * serializes each key into one task's full sort (5 keys over a 100-TB
  * stream = ~20 TB per task, the same shape the as-of join had to engineer
  * around), while this aggregate keeps an O(k) buffer per group, combines
  * MAP-SIDE (each input partition contributes at most k candidates to the
  * shuffle), and merges buffers associatively.
  *
  * Ordering: value DESC, ties broken by id ASC — total and deterministic,
  * so results are partitioning-independent. Null values are skipped (SQL
  * aggregate convention). Returns `array<struct<value double, id bigint>>`
  * sorted best-first; callers posexplode into ranked rows.
  *
  * `distinctIds = true` dedups by id INSIDE the aggregate: an id already
  * kept is skipped, so a pre-aggregation `distinct()` exchange over the
  * raw candidate stream is unnecessary. REQUIRES that duplicates of an id
  * carry the SAME value (the deterministic-recompute duplicates a
  * multi-table LSH candidate generator emits) — the k-slot eviction
  * argument then makes the result identical to distinct-then-top-k: an
  * evicted id was the heap root, so every survivor (and its replacement)
  * beats it, and a re-offered duplicate can never re-enter. The buffer
  * fail-fasts (require) when a still-kept id is re-offered with a
  * DIFFERENT value — a caller violating the precondition gets an error,
  * not a silent divergence. */
case class TopKRows(
    k: Int,
    valueExpr: Expression,
    idExpr: Expression,
    distinctIds: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRows.Buffer] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKRows.entryType, containsNull = false)
  override def prettyName: String = "top_k_rows"

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (v, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_rows expects (double value, bigint id), got (${v.simpleString}, ${i.simpleString})")
    }

  override def createAggregationBuffer(): TopKRows.Buffer =
    new TopKRows.Buffer(k, distinctIds)

  override def update(buf: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.offer(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKRows.Buffer, other: TopKRows.Buffer): TopKRows.Buffer = {
    other.foreach((v, id) => buf.offer(v, id))
    buf
  }

  override def eval(buf: TopKRows.Buffer): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    })
  }

  override def serialize(buf: TopKRows.Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKRows.Buffer =
    TopKRows.Buffer.fromBytes(bytes, k, distinctIds)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKRows {

  val entryType: StructType = StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** `(a_v, a_id)` beats `(b_v, b_id)`: higher value, ties to smaller id.
    * NaN ranks GREATER than everything (both engines' ORDER BY … DESC put
    * NaN first, and DuckDB's rank oracle must agree) — raw IEEE `>` would
    * instead make NaN incomparable, letting one NaN entry block the heap
    * root from ever evicting and silently drop genuinely top rows. `-0.0`
    * ties `0.0` (IEEE `==`), matching SQL equality, so ties still break
    * by id. */
  private def beats(aV: Double, aId: Long, bV: Double, bId: Long): Boolean = {
    val aNan = java.lang.Double.isNaN(aV)
    val bNan = java.lang.Double.isNaN(bV)
    if (aNan || bNan) (aNan && !bNan) || (aNan && bNan && aId < bId)
    else aV > bV || (aV == bV && aId < bId)
  }

  /** Bounded buffer: a k-slot min-heap keyed by the SAME total order used
    * for ranking (heap root = current worst kept entry), so offer() is
    * O(log k) and the group's state never exceeds k entries. */
  final class Buffer(k: Int, distinctIds: Boolean = false) {
    private var n = 0
    private val vs = new Array[Double](k)
    private val ids = new Array[Long](k)

    // linear scan over ≤ k kept entries — k is a small plan constant
    private def indexOfId(id: Long): Int = {
      var i = 0
      while (i < n) { if (ids(i) == id) return i; i += 1 }
      -1
    }

    private def worseThan(i: Int, j: Int): Boolean = beats(vs(j), ids(j), vs(i), ids(i))

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worseThan(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }
    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val (l, r) = (2 * i + 1, 2 * i + 2)
        var m = i
        if (l < n && worseThan(l, m)) m = l
        if (r < n && worseThan(r, m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
    private def swap(i: Int, j: Int): Unit = {
      val tv = vs(i); vs(i) = vs(j); vs(j) = tv
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    def offer(v: Double, id: Long): Unit = {
      val dup = if (distinctIds) indexOfId(id) else -1
      if (dup >= 0) {
        // precondition guard (best-effort: only duplicates of a STILL-KEPT
        // id are visible here): distinctIds requires duplicates of an id
        // to carry the IDENTICAL value — the deterministic-recompute
        // duplicates an LSH candidate generator emits. A caller feeding
        // per-id-varying values (e.g. unrounded recomputed scores) would
        // silently diverge from distinct-then-top-k, so fail fast instead.
        val i = dup
        require(vs(i) == v ||
            (java.lang.Double.isNaN(vs(i)) && java.lang.Double.isNaN(v)),
          s"top_k_rows(distinctIds): id $id re-offered with value $v != kept ${vs(i)} " +
            "— distinctIds requires identical values across an id's duplicates")
      }
      else if (n < k) {
        vs(n) = v; ids(n) = id; n += 1; siftUp(n - 1)
      } else if (beats(v, id, vs(0), ids(0))) {
        vs(0) = v; ids(0) = id; siftDown()
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(vs(i), ids(i)); i += 1 }
    }

    def sortedBestFirst: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var i = 0
      while (i < n) { out(i) = (vs(i), ids(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) => beats(a._1, a._2, b._1, b._2))
      out
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(n)
      var i = 0
      while (i < n) { out.writeDouble(vs(i)); out.writeLong(ids(i)); i += 1 }
      out.flush(); bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte], k: Int, distinctIds: Boolean = false): Buffer = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = new Buffer(k, distinctIds)
      val n = in.readInt()
      var i = 0
      while (i < n) { buf.offer(in.readDouble(), in.readLong()); i += 1 }
      buf
    }
  }
}
