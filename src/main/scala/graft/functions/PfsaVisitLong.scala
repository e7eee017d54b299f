package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType}

/** GenESeSS π̃ visit sweep over LONG-FORM `(cluster, t, symbol)` rows — the
  * array-free companion of [[PfsaVisitCounts]] (same semantics: the cluster's
  * transition skeleton runs from state 0 per sequence, counting (state,
  * symbol) visits; out-of-alphabet symbols are skipped without advancing).
  * Grouped per (cluster, seq_id), it returns the flat |Q|·|Σ| count array for
  * that sequence, without ever materializing the sequence as one array cell.
  *
  * Same run algebra as [[LlkLongScore]]: a contiguous run starting at t = 0
  * folds the single live state plus its |Q|·|Σ| counts (identical arithmetic
  * to the array kernel); any other run folds, per ASSUMED start state, the
  * end state (a composed transition function Q→Q) and the counts it would
  * accrue — runs compose associatively at merge/eval, so the aggregate is
  * arrival-order- and partitioning-independent, with real map-side combine
  * (a partition's chunk collapses to |Q| ints + |Q|²·|Σ| longs, never raw
  * symbols). Dense consecutive `t` per sequence is the efficient encoding
  * (non-adjacent arrivals open fresh runs, as in LlkLongScore).
  */
case class PfsaVisitLong(
    clusterExpr: Expression,
    tExpr: Expression,
    symbolExpr: Expression,
    connByCluster: Map[Int, Array[Array[Int]]],
    alphabetSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PfsaVisitLong.Buffer] {

  import PfsaVisitLong._

  override def children: Seq[Expression] = Seq(clusterExpr, tExpr, symbolExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pfsa_visit_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (clusterExpr.dataType, tExpr.dataType, symbolExpr.dataType) match {
      case (IntegerType, LongType, ByteType) => TypeCheckResult.TypeCheckSuccess
      case (c, t, s) => TypeCheckResult.TypeCheckFailure(
        s"pfsa_visit_long expects (int cluster, bigint t, tinyint symbol), got ($c, $t, $s)")
    }

  override def createAggregationBuffer(): Buffer = new Buffer

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val cAny = clusterExpr.eval(input)
    val tAny = tExpr.eval(input)
    val sAny = symbolExpr.eval(input)
    if (cAny == null || tAny == null || sAny == null) return buf
    buf.add(cAny.asInstanceOf[Int], tAny.asInstanceOf[Long],
      sAny.asInstanceOf[Byte].toInt, connByCluster, alphabetSize)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = { buf.absorb(other); buf }

  override def eval(buf: Buffer): Any =
    new GenericArrayData(buf.result(connByCluster, alphabetSize))

  override def serialize(buf: Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): PfsaVisitLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PfsaVisitLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): PfsaVisitLong =
    copy(clusterExpr = newChildren(0), tExpr = newChildren(1), symbolExpr = newChildren(2))
}

object PfsaVisitLong {

  /** One contiguous run. Head mode (tFirst == 0): `q` is the live state and
    * `cnt` the |Q|·|Σ| counts. Mid mode: `f(q0)` is the end state and
    * `cnt(q0·|Q|·|Σ| + q·|Σ| + s)` the counts under assumed start `q0`. */
  private final class Run(var tFirst: Long, var tLast: Long) {
    var q: Int = 0
    var f: Array[Int] = null
    var cnt: Array[Long] = null
  }

  final class Buffer {
    private var cluster: Int = Int.MinValue
    // cached machine for this group's cluster (transient, resolved on first
    // row / first eval — avoids a Map lookup per input row)
    private var conn: Array[Array[Int]] = null
    private val runs = new java.util.ArrayList[Run](1)

    private def newRun(t: Long, conn: Array[Array[Int]], k: Int): Run = {
      val nq = conn.length
      val r = new Run(t, t)
      if (t == 0L) { r.q = 0; r.cnt = new Array[Long](nq * k) }
      else {
        r.f = Array.tabulate(nq)(identity)
        r.cnt = new Array[Long](nq * nq * k)
      }
      r
    }

    private def appendSymbol(r: Run, conn: Array[Array[Int]], k: Int, s: Int): Unit = {
      if (s < 0 || s >= k) return // out-of-alphabet: skip, state unchanged
      val nq = conn.length
      if (r.f == null) {
        r.cnt(r.q * k + s) += 1
        r.q = conn(r.q)(s)
      } else {
        var q0 = 0
        while (q0 < nq) {
          val q = r.f(q0)
          r.cnt(q0 * nq * k + q * k + s) += 1
          r.f(q0) = conn(q)(s)
          q0 += 1
        }
      }
    }

    def add(c: Int, t: Long, s: Int,
            conns: Map[Int, Array[Array[Int]]], k: Int): Unit = {
      // contract: t >= 0 — same head-run-composes-first assumption as
      // LlkLongScore (the t = 0 run anchors state 0); reject negatives loudly
      // rather than silently dropping their contribution at result()
      if (t < 0L) throw new IllegalArgumentException(
        s"pfsa_visit_long requires t >= 0 per sequence (got t = $t); re-rank t dense from 0")
      if (cluster == Int.MinValue) cluster = c
      if (conn == null) conn = conns(cluster)
      val size = runs.size
      if (size > 0) {
        val last = runs.get(size - 1)
        if (t == last.tLast + 1) {
          appendSymbol(last, conn, k, s)
          last.tLast = t
          return
        }
      }
      val r = newRun(t, conn, k)
      appendSymbol(r, conn, k, s)
      var i = runs.size
      while (i > 0 && runs.get(i - 1).tFirst > t) i -= 1
      runs.add(i, r)
    }

    def absorb(other: Buffer): Unit = {
      if (cluster == Int.MinValue) cluster = other.cluster
      val it = other.runs.iterator()
      while (it.hasNext) {
        val r = it.next()
        var i = runs.size
        while (i > 0 && runs.get(i - 1).tFirst > r.tFirst) i -= 1
        runs.add(i, r)
      }
    }

    /** Compose runs in t order from state 0 → total |Q|·|Σ| counts. */
    def result(conns: Map[Int, Array[Array[Int]]], k: Int): Array[Long] = {
      if (cluster == Int.MinValue || runs.isEmpty) return Array.empty[Long]
      if (conn == null) conn = conns(cluster) // deserialized buffers arrive without the cache
      val nq = conn.length
      val out = new Array[Long](nq * k)
      var cur = 0
      var i = 0
      while (i < runs.size) {
        val r = runs.get(i)
        if (r.f == null) { // head run: its counts are absolute
          var j = 0
          while (j < out.length) { out(j) += r.cnt(j); j += 1 }
          cur = r.q
        } else {
          val base = cur * nq * k
          var j = 0
          while (j < nq * k) { out(j) += r.cnt(base + j); j += 1 }
          cur = r.f(cur)
        }
        i += 1
      }
      out
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(cluster)
      out.writeInt(runs.size)
      var i = 0
      while (i < runs.size) {
        val r = runs.get(i)
        out.writeLong(r.tFirst); out.writeLong(r.tLast)
        out.writeBoolean(r.f == null)
        if (r.f == null) out.writeInt(r.q)
        else {
          out.writeInt(r.f.length)
          var j = 0
          while (j < r.f.length) { out.writeInt(r.f(j)); j += 1 }
        }
        out.writeInt(r.cnt.length)
        var j = 0
        while (j < r.cnt.length) { out.writeLong(r.cnt(j)); j += 1 }
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte]): Buffer = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = new Buffer
      buf.cluster = in.readInt()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val r = new Run(in.readLong(), in.readLong())
        if (in.readBoolean()) r.q = in.readInt()
        else {
          val fl = in.readInt()
          r.f = new Array[Int](fl)
          var j = 0
          while (j < fl) { r.f(j) = in.readInt(); j += 1 }
        }
        val cl = in.readInt()
        r.cnt = new Array[Long](cl)
        var j = 0
        while (j < cl) { r.cnt(j) = in.readLong(); j += 1 }
        buf.runs.add(r)
        i += 1
      }
      buf
    }
  }
}
