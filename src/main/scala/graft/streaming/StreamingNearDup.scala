package graft.streaming

import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One stored occupant of an LSH band bucket: the doc and its full MinHash
  * signature (the signature is what lets a later arrival ESTIMATE Jaccard
  * against it without ever fetching the document text). */
final case class BucketMember(doc_id: Long, sig: Seq[Long])

/** A banded input row: doc + signature + the (band, bucket) key it landed
  * in. One doc produces exactly `bands` of these. */
final case class BandedSig(doc_id: Long, sig: Seq[Long], band: Int, bucket: Long)

/** An emitted near-dup candidate: canonical (id_a < id_b), the signature-
  * agreement Jaccard estimate, and the band that caught it (the same pair
  * may surface from several bands — consumers `distinct` on (id_a, id_b)). */
final case class NearDupHit(id_a: Long, id_b: Long, est_jaccard: Double, band: Int)

/** Incremental MinHash near-dup detection over an unbounded document
  * stream — the streaming counterpart of the batch `dedup_minhash` pass
  * (shingle → 64-perm MinHash → 16-band LSH), with the band-bucket
  * self-JOIN replaced by band-bucket keyed STATE: each (band, bucket) key
  * holds the members seen so far, and a new arrival compares only against
  * its own bucket's occupants, across triggers.
  *
  * Scale design:
  *   - State is keyed by (band, bucket) — hash-partitioned across
  *     executors like any keyed state — and each bucket's occupant list is
  *     capped at `maxBucketSize`: a degenerate swarm (thousands of
  *     near-identical docs sharing a bucket) stores and compares against
  *     at most the cap, never going quadratic. A doc joins exactly `bands`
  *     buckets, so TOTAL state is bounded by
  *     `bands × min(N_docs, n_buckets × maxBucketSize)` members of
  *     `8 + 8·numHashes` bytes (~0.5 KB each at 64 hashes): ≈ 8 KB per
  *     distinct doc worst-case, living in the state store (RocksDB at
  *     scale — `transformWithState` requires the RocksDB provider, which
  *     keeps it off-heap), not on the heap.
  *   - Per-arrival work is bounded by `bands × maxBucketSize` signature
  *     comparisons (64-long vector each) — independent of corpus size.
  *   - An optional `ttl` expires bucket occupants not re-written within
  *     the duration (processing-time TTL on the state store), the
  *     horizon-bounded regime of `dropDuplicatesWithinWatermark`: state
  *     then tracks the horizon's arrival volume instead of all history,
  *     trading away detection of pairs that straddle the horizon.
  *
  * Emission semantics: when a doc lands in a bucket it emits one
  * [[NearDupHit]] per stored occupant whose signature-agreement estimate
  * (`|{i : sig_a[i] = sig_b[i]}| / numHashes`, the unbiased MinHash
  * Jaccard estimator) is ≥ `threshold`; it is then stored itself iff the
  * bucket is under cap. Pairs colliding in several bands are emitted once
  * per band (same estimate each time) — `distinct` on (id_a, id_b)
  * downstream. Cap admission within a micro-batch is a bounded top-k by
  * doc_id (the `cap − stored` smallest arrivals win), so WHICH docs get
  * stored is deterministic regardless of arrival order, and per-batch
  * task memory is bounded by `cap` members — a whole-corpus swarm landing
  * in one AvailableNow batch never buffers beyond the cap. While a batch
  * exceeds an open bucket's room, which TRANSIENT (evicted-candidate)
  * pairs surface can depend on arrival order — pairs among the admitted
  * members and every (stored, arrival) pair always surface; once a bucket
  * is full, later batches compare against exactly the stored cap.
  */
object StreamingNearDup {

  /** The RocksDB provider `transformWithState` requires (Spark 4.x). */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private class NearDupProcessor(threshold: Double, numHashes: Int, cap: Int,
                                 ttl: Option[java.time.Duration])
      extends StatefulProcessor[(Int, Long), BandedSig, NearDupHit] {
    @transient private var members: ListState[BucketMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[BucketMember](
        "members", Encoders.product[BucketMember],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandedSig],
                                 timers: TimerValues): Iterator[NearDupHit] = {
      val pre = if (members.exists()) members.get().toArray else Array.empty[BucketMember]
      val room = cap - pre.length
      // Bounded admission buffer: the `room` smallest arrivals by doc_id,
      // maintained as a max-heap in ONE pass over the iterator. This is
      // the only per-batch buffer, so a degenerate identical-text swarm
      // arriving in a single AvailableNow batch holds at most `cap`
      // members (~0.5 KB each) on this task — never the whole batch.
      // The final admitted set (k smallest by id) is order-independent,
      // so WHICH docs get stored stays deterministic under the cap.
      val heap = scala.collection.mutable.PriorityQueue.empty[BucketMember](
        Ordering.by(_.doc_id))
      val out = Seq.newBuilder[NearDupHit]
      rows.foreach { r =>
        val sig = r.sig
        def score(m: BucketMember): Unit = if (m.doc_id != r.doc_id) {
          var agree = 0
          var i = 0
          while (i < numHashes) {
            if (m.sig(i) == sig(i)) agree += 1
            i += 1
          }
          val est = agree.toDouble / numHashes
          if (est >= threshold)
            out += NearDupHit(math.min(m.doc_id, r.doc_id),
              math.max(m.doc_id, r.doc_id), est, key._1)
        }
        pre.foreach(score)
        heap.foreach(score)
        if (room > 0) {
          if (heap.size < room) heap.enqueue(BucketMember(r.doc_id, sig))
          else if (r.doc_id < heap.head.doc_id) {
            heap.dequeue()
            heap.enqueue(BucketMember(r.doc_id, sig))
          }
        }
      }
      if (heap.nonEmpty) members.put(pre ++ heap.toArray.sortBy(_.doc_id))
      out.result().iterator
    }
  }

  /** Near-dup candidate pairs over a streaming `docs` frame with `doc_id`
    * and `text` columns (append mode; parameters mirror the batch
    * `dedup_minhash`: 5-gram char shingles of the normalized text, 64
    * permutations, 16 bands of 4). The session must run the RocksDB state
    * store provider ([[RocksDbProvider]]). */
  /** Defaults shared with harness code that sizes state bounds — keep the
    * bound arithmetic tied to these, not re-derived literals. */
  val DefaultNumHashes = 64
  val DefaultBands = 16
  val DefaultMaxBucketSize = 256

  def nearDupPairs(docs: DataFrame, threshold: Double = 0.5,
                   numHashes: Int = DefaultNumHashes, bands: Int = DefaultBands,
                   shingleK: Int = 5,
                   maxBucketSize: Int = DefaultMaxBucketSize,
                   ttl: Option[java.time.Duration] = None): DataFrame = {
    require(numHashes % bands == 0, s"numHashes $numHashes must split into $bands bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .withColumn("norm", TextOps.normalized("text"))
      // per-ROW md5-parity signature (TextOps.minhashSigCol): the batch
      // dedup's relational groupBy shape would add a second stateful
      // operator here; the values are identical, so stream and batch
      // pipelines stay hash-comparable
      .withColumn("sig", TextOps.minhashSigCol(
        TextOps.charShingles("norm", shingleK), numHashes))
      .select(col("doc_id"), col("sig"),
        posexplode(TextOps.bandBucketCols(col("sig"), bands, numHashes / bands))
          .as(Seq("band", "bucket")))
      .as[BandedSig]
    banded
      .groupByKey(r => (r.band, r.bucket))
      .transformWithState(
        new NearDupProcessor(threshold, numHashes, maxBucketSize, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }
}
