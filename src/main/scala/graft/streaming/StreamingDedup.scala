package graft.streaming

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental exact deduplication over an unbounded document stream — the
  * continuous-ingestion counterpart of the batch `dedup_exact` pass: the
  * first document carrying a given normalized-text hash is emitted, every
  * later copy is dropped, across triggers.
  *
  * Two state regimes, both riding Spark's streaming-dedup state store
  * rather than hand-rolled keyed state (the built-in operator gets
  * map-side pre-dedup within a trigger and state-store pluggability —
  * RocksDB at scale — for free):
  *
  *   - [[distinctDocs]]: dedup against the FULL history. State is one
  *     entry per distinct document hash — the dedup index itself, which
  *     is the honest cost of exact full-history dedup (≈ tens of bytes ×
  *     distinct docs, hash-partitioned across executors; a billion
  *     distinct docs is tens of GB of RocksDB, not of heap).
  *   - [[distinctDocsWithinWatermark]]: dedup within an event-time
  *     horizon; the watermark EVICTS hashes older than the delay, so
  *     state is bounded by the horizon's arrival volume. The trade is
  *     explicit: a copy arriving after its original has aged out is
  *     emitted again (re-dedup downstream, batch-side).
  */
object StreamingDedup {

  /** Adds `norm_md5` and keeps only the first arrival per hash (append
    * mode; works identically under batch execution, where it degenerates
    * to an arbitrary-representative exact dedup). */
  def distinctDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm_md5", md5(TextOps.normalized("text")))
      .dropDuplicates("norm_md5")

  /** Horizon-bounded variant: `eventTimeCol` must be a timestamp column;
    * hashes older than `delay` behind the watermark are evicted. */
  def distinctDocsWithinWatermark(docs: DataFrame, eventTimeCol: String,
                                  delay: String): DataFrame =
    docs
      .withColumn("norm_md5", md5(TextOps.normalized("text")))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("norm_md5")
}
