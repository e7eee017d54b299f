package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import graft.core.Pfsa
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, LongType}

/** llk scoring as a [[TypedImperativeAggregate]] over LONG-FORM
  * `(t, symbol)` rows — the giant-sequence scale path (SURVEY §2.4 / §4.2
  * item 1): a sequence is NEVER materialized as one `array<tinyint>` cell, so
  * a billion-symbol stream folds in O(|Q|·k) state per group instead of a
  * 1 GB `collect_list` row (reference streams cap at 500k symbols,
  * examples/M2.cfg:15-17; 100-TB streams are unbounded).
  *
  * Algebra (reference Alg. 1, tex/ms.tex:261-287): llk is `-log2` of the
  * 1-norm of a product of per-symbol transition operators applied to the
  * stationary distribution. A partial buffer therefore holds, per model, one
  * of two associative summaries of a contiguous arrival-run of symbols:
  *
  *   - a run starting at `t = 0` folds the actual distribution VECTOR plus
  *     the running loss — operation-for-operation identical to
  *     [[graft.core.Llk.llk]], so a sequence wholly contained in one
  *     partition scores BIT-EXACTLY like the array path;
  *   - any other run folds the |Q|×|Q| transition MATRIX of the run (kept
  *     sum-normalized, with the log-scale factor carried separately so long
  *     runs cannot underflow).
  *
  * Runs compose left-to-right at merge/eval (vector·matrix = O(|Q|²),
  * matrix-run append = O(|Q|²) per symbol), which makes the aggregate
  * order- and partition-robust: map-side partial aggregation works — a
  * partition's chunk of a sequence collapses to k small matrices BEFORE the
  * shuffle, so only O(parts·k·|Q|²) doubles move, never raw symbols.
  *
  * Correctness is arrival-order- and partitioning-INDEPENDENT: a run only
  * extends on the dense-adjacent symbol (`t == tLast + 1` — a t-gap may live
  * in another partition's buffer, so it always opens a fresh run), and runs
  * compose in t order at eval. `t` as dense consecutive integers per
  * sequence (the canonical long form: Tables.eventsLong, Segment.windows)
  * is the EFFICIENT encoding — sparse/descending arrival still scores
  * correctly but degrades toward one run per gap. `(seq_id, t)` is assumed
  * unique (duplicates would compose in t-sorted run order, matching the
  * array path's `array_sort`).
  */
case class LlkLongScore(
    tExpr: Expression,
    symbolExpr: Expression,
    library: Array[Pfsa],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LlkLongScore.Buffer] {

  import LlkLongScore._

  override def children: Seq[Expression] = Seq(tExpr, symbolExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "llk_score_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (tExpr.dataType, symbolExpr.dataType) match {
      case (LongType, ByteType) => TypeCheckResult.TypeCheckSuccess
      case (t, s) => TypeCheckResult.TypeCheckFailure(
        s"llk_score_long expects (bigint t, tinyint symbol), got (${t.simpleString}, ${s.simpleString})")
    }

  override def createAggregationBuffer(): Buffer = new Buffer

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val tAny = tExpr.eval(input)
    val sAny = symbolExpr.eval(input)
    if (tAny == null || sAny == null) return buf // quantizers never emit null; defensive skip
    buf.add(tAny.asInstanceOf[Long], sAny.asInstanceOf[Byte].toInt, library)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = { buf.absorb(other); buf }

  override def eval(buf: Buffer): Any = new GenericArrayData(buf.result(library))

  override def serialize(buf: Buffer): Array[Byte] = buf.toBytes(library)
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(bytes, library)

  override def withNewMutableAggBufferOffset(newOffset: Int): LlkLongScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LlkLongScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LlkLongScore =
    copy(tExpr = newChildren(0), symbolExpr = newChildren(1))
}

object LlkLongScore {

  private val LOG2 = math.log(2.0)

  /** Per-model fold state of one contiguous run. Exactly one of `p` (vector
    * mode, run starts the sequence at t=0) or `a` (matrix mode) is non-null;
    * `dead` marks an inexplicable run (out-of-alphabet symbol or zero mass)
    * — the whole sequence then scores +∞ for that model, as in Llk.llk. */
  private final class ModelRun {
    var dead: Boolean = false
    var p: Array[Double] = null   // |Q|, current distribution
    var loss: Double = 0.0        // vector mode: accumulated -log2 step mass
    var a: Array[Double] = null   // |Q|×|Q| row-major, sum-normalized
    var lnScale: Double = 0.0     // matrix mode: ln of the normalization pulled out
    // swap buffer for the per-symbol step — a million-symbol stream must not
    // allocate a fresh array per symbol (transient: never serialized)
    var tmp: Array[Double] = null
  }

  /** One contiguous arrival-run `[tFirst, tLast]` with `cnt` symbols. */
  private final class Run(var tFirst: Long, var tLast: Long, var cnt: Long,
                          val models: Array[ModelRun])

  final class Buffer {
    // sorted by tFirst; tiny in practice (1 run per source partition chunk)
    private val runs = new java.util.ArrayList[Run](1)

    private def newRun(t: Long, lib: Array[Pfsa]): Run = {
      val ms = new Array[ModelRun](lib.length)
      var m = 0
      while (m < lib.length) {
        val mr = new ModelRun
        if (t == 0L) { mr.p = lib(m).stationary.clone() } // sequence head: fold the true vector
        else {
          val n = lib(m).numStates
          mr.a = new Array[Double](n * n)
          var i = 0
          while (i < n) { mr.a(i * n + i) = 1.0; i += 1 } // identity
        }
        ms(m) = mr
        m += 1
      }
      new Run(t, t, 0L, ms)
    }

    /** Append symbol `s` to run `r` under model `pfsa` — vector mode mirrors
      * Llk.llk op-for-op (bit-exact); matrix mode pushes every start-state
      * row through the same transition and renormalizes by the total sum. */
    private def appendSymbol(mr: ModelRun, pfsa: Pfsa, s: Int): Unit = {
      if (mr.dead) return
      val n = pfsa.numStates
      if (s < 0 || s >= pfsa.alphabetSize) { mr.dead = true; mr.p = null; mr.a = null; return }
      if (mr.p != null) {
        if (mr.tmp == null || mr.tmp.length != n) mr.tmp = new Array[Double](n)
        val next = mr.tmp
        java.util.Arrays.fill(next, 0.0)
        var mass = 0.0
        var q = 0
        while (q < n) {
          val w = mr.p(q) * pfsa.pitilde(q)(s)
          if (w != 0.0) { mass += w; next(pfsa.conn(q)(s)) += w }
          q += 1
        }
        if (mass <= 0.0) { mr.dead = true; mr.p = null; mr.tmp = null; return }
        mr.loss -= math.log(mass) / LOG2
        var i = 0
        while (i < n) { next(i) /= mass; i += 1 }
        mr.tmp = mr.p
        mr.p = next
      } else {
        if (mr.tmp == null || mr.tmp.length != n * n) mr.tmp = new Array[Double](n * n)
        val next = mr.tmp
        java.util.Arrays.fill(next, 0.0)
        var total = 0.0
        var i = 0
        while (i < n) {
          val base = i * n
          var q = 0
          while (q < n) {
            val w = mr.a(base + q) * pfsa.pitilde(q)(s)
            if (w != 0.0) { total += w; next(base + pfsa.conn(q)(s)) += w }
            q += 1
          }
          i += 1
        }
        if (total <= 0.0) { mr.dead = true; mr.a = null; mr.tmp = null; return }
        var j = 0
        val nn = n * n
        while (j < nn) { next(j) /= total; j += 1 }
        mr.tmp = mr.a
        mr.a = next
        mr.lnScale += math.log(total)
      }
    }

    def add(t: Long, s: Int, lib: Array[Pfsa]): Unit = {
      // contract: t >= 0 — the t = 0 row anchors the stationary-start head
      // run, and result() composes it first BECAUSE nothing sorts below it.
      // A negative t would sort ahead and be silently discarded there, so
      // reject it loudly here instead.
      if (t < 0L) throw new IllegalArgumentException(
        s"llk_score_long requires t >= 0 per sequence (got t = $t); re-rank t dense from 0")
      val size = runs.size
      if (size > 0) {
        val last = runs.get(size - 1)
        if (t == last.tLast + 1) { // dense in-order arrival: extend the latest run
          var m = 0
          while (m < lib.length) { appendSymbol(last.models(m), lib(m), s); m += 1 }
          last.tLast = t; last.cnt += 1
          return
        }
      }
      // first row, a t-gap (its rows may live in another partition's buffer),
      // or out-of-order arrival: open a fresh run, insert sorted
      val r = newRun(t, lib)
      var m = 0
      while (m < lib.length) { appendSymbol(r.models(m), lib(m), s); m += 1 }
      r.cnt = 1L
      var i = runs.size
      while (i > 0 && runs.get(i - 1).tFirst > t) i -= 1
      runs.add(i, r)
    }

    /** Merge another buffer's runs in, keeping tFirst order (composition to a
      * single summary happens once, at eval). */
    def absorb(other: Buffer): Unit = {
      val it = other.runs.iterator()
      while (it.hasNext) {
        val r = it.next()
        var i = runs.size
        while (i > 0 && runs.get(i - 1).tFirst > r.tFirst) i -= 1
        runs.add(i, r)
      }
    }

    /** Compose runs left-to-right per model → llk array (loss/len, +∞ if any
      * run is dead or the composed mass vanishes; 0.0 for an empty group,
      * matching Llk.llk on an empty sequence). */
    def result(lib: Array[Pfsa]): Array[Double] = {
      val out = new Array[Double](lib.length)
      if (runs.isEmpty) return out
      var total = 0L
      var i = 0
      while (i < runs.size) { total += runs.get(i).cnt; i += 1 }
      var m = 0
      while (m < lib.length) {
        val pfsa = lib(m)
        val n = pfsa.numStates
        var p: Array[Double] = null
        var loss = 0.0
        var dead = false
        var r = 0
        while (r < runs.size && !dead) {
          val mr = runs.get(r).models(m)
          if (mr.dead) dead = true
          else if (mr.p != null) {
            // head run (only ever first: tFirst==0 sorts ahead of all others)
            p = mr.p; loss = mr.loss
          } else {
            if (p == null) p = pfsa.stationary.clone() // no t=0 head: start from stationary
            val next = new Array[Double](n)
            var j = 0
            while (j < n) {
              var acc = 0.0
              var q = 0
              while (q < n) { acc += p(q) * mr.a(q * n + j); q += 1 }
              next(j) = acc
              j += 1
            }
            var mass = 0.0
            var k = 0
            while (k < n) { mass += next(k); k += 1 }
            if (mass <= 0.0) dead = true
            else {
              loss -= (mr.lnScale + math.log(mass)) / LOG2
              var k2 = 0
              while (k2 < n) { next(k2) /= mass; k2 += 1 }
              p = next
            }
          }
          r += 1
        }
        out(m) = if (dead) Double.PositiveInfinity else loss / total
        m += 1
      }
      out
    }

    def toBytes(lib: Array[Pfsa]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(runs.size)
      var i = 0
      while (i < runs.size) {
        val r = runs.get(i)
        out.writeLong(r.tFirst); out.writeLong(r.tLast); out.writeLong(r.cnt)
        var m = 0
        while (m < lib.length) {
          val mr = r.models(m)
          val mode: Byte = if (mr.dead) 2 else if (mr.p != null) 0 else 1
          out.writeByte(mode)
          if (mode == 0) {
            out.writeDouble(mr.loss)
            var j = 0
            while (j < mr.p.length) { out.writeDouble(mr.p(j)); j += 1 }
          } else if (mode == 1) {
            out.writeDouble(mr.lnScale)
            var j = 0
            while (j < mr.a.length) { out.writeDouble(mr.a(j)); j += 1 }
          }
          m += 1
        }
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte], lib: Array[Pfsa]): Buffer = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = new Buffer
      val nRuns = in.readInt()
      var i = 0
      while (i < nRuns) {
        val tFirst = in.readLong(); val tLast = in.readLong(); val cnt = in.readLong()
        val ms = new Array[ModelRun](lib.length)
        var m = 0
        while (m < lib.length) {
          val mr = new ModelRun
          val n = lib(m).numStates
          in.readByte() match {
            case 0 =>
              mr.loss = in.readDouble()
              mr.p = new Array[Double](n)
              var j = 0
              while (j < n) { mr.p(j) = in.readDouble(); j += 1 }
            case 1 =>
              mr.lnScale = in.readDouble()
              mr.a = new Array[Double](n * n)
              var j = 0
              while (j < n * n) { mr.a(j) = in.readDouble(); j += 1 }
            case _ => mr.dead = true
          }
          ms(m) = mr
          m += 1
        }
        // serialized in sorted order; re-absorb preserves it
        val r = new Run(tFirst, tLast, cnt, ms)
        buf.runs.add(r)
        i += 1
      }
      buf
    }
  }
}
