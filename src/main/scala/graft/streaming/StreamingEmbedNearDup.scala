package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One stored occupant of a sign-code bucket: the vector id and the full
  * embedding (what a later arrival needs to score an EXACT cosine against
  * it without re-fetching the corpus). */
final case class VecMember(vec_id: Long, v: Seq[Double])

/** A coded input row: vector + the (table, code) bucket it landed in.
  * One vector produces exactly `tables` of these. */
final case class CodedVec(vec_id: Long, v: Seq[Double], table: Int, code: Long)

/** An emitted near-dup candidate: canonical (id_a < id_b), the RAW exact
  * cosine (rounding/thresholding happens relationally downstream so the
  * boundary arithmetic is Spark's, not this handler's), and the table
  * that caught it (a pair may surface from several tables — consumers
  * `distinct` on (id_a, id_b)). */
final case class VecHit(id_a: Long, id_b: Long, cos: Double, table: Int)

/** Incremental near-duplicate detection over an unbounded EMBEDDING
  * stream — the vector counterpart of [[StreamingNearDup]] (the
  * production shape for continuous ingestion of embeddings, batch-side
  * covered by `dedup_embedding`): bucket by locality-sensitive sign
  * codes, keep capped per-bucket occupant state across triggers, score
  * arrivals against their own bucket only.
  *
  * Codes are COORDINATE-hyperplane LSH: table `t`'s code is the sign
  * pattern of `bits` consecutive coordinates starting at `t·bits` —
  * hyperplane hashing with axis-aligned normals. Two vectors collide in
  * table t iff those coordinates agree in sign, so identical vectors
  * collide in every table and near-identical ones disagree only where a
  * coordinate sits near zero. Choosing the AXES (not Gaussian normals,
  * the batch family's [[graft.functions.HyperplaneCodes]] kernel) keeps
  * the whole detector replayable as plain SQL — the md5-parity lesson
  * that upgraded dedup_minhash to a full value-level oracle: bucket
  * membership, occupancy, and the cap exclusion are all
  * `CASE WHEN v[i] >= 0` arithmetic an independent engine can rerun.
  *
  * Scale design (the [[StreamingNearDup]] contract, vectors instead of
  * signatures):
  *   - state is keyed by (table, code), hash-partitioned like any keyed
  *     state; per-bucket occupants capped at `maxBucketSize`, so total
  *     state ≤ `tables × min(N, 2^bits × cap)` members of `8 + 8·dim`
  *     bytes (~0.5 KB at dim 64), in RocksDB, off-heap;
  *   - per-arrival work ≤ `tables × cap` exact-cosine folds — independent
  *     of corpus size;
  *   - cap admission within a micro-batch is the bounded smallest-id
  *     top-k heap (order-independent admitted set, ≤ cap members of task
  *     memory even when a whole swarm shares one AvailableNow batch);
  *   - optional processing-time TTL bounds state to the horizon's
  *     arrival volume (the dropDuplicatesWithinWatermark regime).
  *
  * Determinism contract the gate relies on: in a bucket whose TOTAL
  * arrivals never exceed the cap, every arrival is admitted, so every
  * qualifying pair in it surfaces regardless of arrival order or
  * micro-batch split. Over-cap buckets degrade exactly like
  * [[StreamingNearDup]]'s: (stored, arrival) pairs and admitted-member
  * pairs always surface, transients may depend on order — which is why
  * the gate's verdict universe is restricted to under-cap buckets.
  *
  * The cosine is the family's exact kernel form — `dot/(√na·√nb)`, each
  * accumulator an index-ascending sequential fold — bit-identical to
  * [[graft.functions.VecDot]]-based `Similarity.cosine`, so the emitted
  * raw cosine rounds exactly like the relational recompute.
  */
object StreamingEmbedNearDup {

  val DefaultTables = 4
  val DefaultBits = 12
  val DefaultMaxBucketSize = 256
  /** Handler-side emission floor, deliberately BELOW any relational
    * threshold consumers apply on the rounded value, so the 6-dp boundary
    * is decided by Spark's round, never by this pre-filter. */
  val DefaultFloor = 0.98

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private class EmbedNearDupProcessor(floor: Double, cap: Int,
                                      ttl: Option[java.time.Duration])
      extends StatefulProcessor[(Int, Long), CodedVec, VecHit] {
    @transient private var members: ListState[VecMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[VecMember](
        "members", Encoders.product[VecMember],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: (Int, Long), rows: Iterator[CodedVec],
                                 timers: TimerValues): Iterator[VecHit] = {
      val pre = if (members.exists()) members.get().toArray else Array.empty[VecMember]
      val room = cap - pre.length
      // bounded admission: the `room` smallest ids win, via a max-heap —
      // one pass, ≤ cap members buffered (see StreamingNearDup)
      val heap = scala.collection.mutable.PriorityQueue.empty[VecMember](
        Ordering.by(_.vec_id))
      val out = Seq.newBuilder[VecHit]
      rows.foreach { r =>
        def score(m: VecMember): Unit = if (m.vec_id != r.vec_id) {
          val c = cos(m.v, r.v)
          if (c >= floor)
            out += VecHit(math.min(m.vec_id, r.vec_id),
              math.max(m.vec_id, r.vec_id), c, key._1)
        }
        pre.foreach(score)
        heap.foreach(score)
        if (room > 0) {
          if (heap.size < room) heap.enqueue(VecMember(r.vec_id, r.v))
          else if (r.vec_id < heap.head.vec_id) {
            heap.dequeue()
            heap.enqueue(VecMember(r.vec_id, r.v))
          }
        }
      }
      if (heap.nonEmpty) members.put(pre ++ heap.toArray.sortBy(_.vec_id))
      out.result().iterator
    }
  }

  /** The (table, code) coding projection as columns — shared verbatim by
    * the streaming leg and the relational expected-universe recompute, so
    * both sides bucket identically by construction. Requires
    * `dim ≥ tables·bits` (the fixture's 64 covers 4×12). */
  def signCode(v: org.apache.spark.sql.Column, table: Int, bits: Int)
      : org.apache.spark.sql.Column =
    (0 until bits).map(j =>
      when(v(table * bits + j) >= 0d, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Near-dup candidate pairs over a streaming frame with `vec_id` and
    * `v: array<double>` columns (append mode). The session must run the
    * RocksDB state store provider. Emits RAW cosines ≥ `floor`; round and
    * threshold downstream. */
  def nearDupVecs(vecs: DataFrame,
                  tables: Int = DefaultTables, bits: Int = DefaultBits,
                  floor: Double = DefaultFloor,
                  maxBucketSize: Int = DefaultMaxBucketSize,
                  ttl: Option[java.time.Duration] = None): DataFrame = {
    require(bits > 0 && bits < 63 && tables > 0, s"bad geometry: $tables x $bits")
    val spark = vecs.sparkSession
    import spark.implicits._
    val coded = vecs
      .select(col("vec_id"), col("v"),
        posexplode(array((0 until tables).map(t =>
          signCode(col("v"), t, bits)): _*)).as(Seq("table", "code")))
      .as[CodedVec]
    coded
      .groupByKey(r => (r.table, r.code))
      .transformWithState(
        new EmbedNearDupProcessor(floor, maxBucketSize, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }
}
