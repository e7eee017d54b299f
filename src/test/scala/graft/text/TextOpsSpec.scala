package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the dedup stack: known near-duplicates MUST share an
  * LSH band bucket and verify above the Jaccard threshold; unrelated docs
  * must not pair up. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "cat watches from the warm windowsill and the birds sing in the garden " +
    "under a bright morning sun with dew still on the grass"
  // near-dup: one word changed
  private val nearDup = base.replace("morning", "evening")
  // unrelated text, same length scale
  private val other = "completely different content about distributed query " +
    "engines shuffling partitioned columnar data across executor nodes with " +
    "broadcast joins adaptive execution and whole stage code generation"

  private def corpus = Seq(
    (0L, base), (1L, nearDup), (2L, other),
    (3L, "tiny"), (4L, base.toUpperCase)) // case variant → exact dup after normalize
    .toDF("doc_id", "text")

  test("minhash signatures: identical after normalization, close for near-dups") {
    val sigDf = corpus
      .select(col("doc_id"), TextOps.normalized("text").as("norm"))
      .withColumn("sh", TextOps.charShingles("norm", 5))
      .withColumn("sig", TextOps.minhashSigUdf(64, 42L)(col("sh")))
    val sigs = sigDf.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(4L), "case variant must hash identically")
    val agree01 = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    val agree02 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree01 > 32, s"near-dup agreement too low: $agree01/64")
    assert(agree02 < 16, s"unrelated agreement too high: $agree02/64")
  }

  test("LSH banding pairs near-dups, not unrelated docs") {
    val sigDf = corpus
      .select(col("doc_id"), TextOps.normalized("text").as("norm"))
      .withColumn("sh", TextOps.charShingles("norm", 5))
      .withColumn("sig", TextOps.minhashSigUdf(64, 42L)(col("sh")))
    val pairs = TextOps.candidatePairs(
      TextOps.bandBuckets(sigDf, "doc_id", "sig", bands = 16, rowsPerBand = 4), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "near-dup pair not a candidate")
    assert(pairs.contains((0L, 4L)), "exact-dup pair not a candidate")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      s"unrelated doc became a candidate: $pairs")
  }

  test("bucket-size cap drops hot buckets before the self-join") {
    // 300 identical docs → one bucket of 300 per band; cap 100 must kill it
    val swarm = (0L until 300L).map(i => (i, "identical text for everyone"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.normalized("text").as("norm"))
      .withColumn("sh", TextOps.charShingles("norm", 5))
      .withColumn("sig", TextOps.minhashSigUdf(16, 42L)(col("sh")))
    val buckets = TextOps.bandBuckets(swarm, "doc_id", "sig", bands = 4, rowsPerBand = 4)
    assert(TextOps.candidatePairs(buckets, "doc_id", maxBucketSize = 100).count() == 0L)
    // with a big enough cap the pairs appear (bounded quadratic is allowed)
    assert(TextOps.candidatePairs(buckets, "doc_id", maxBucketSize = 500).count() > 0L)
  }

  test("simhash: near-dups within small Hamming distance, unrelated far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hs = corpus.select(col("doc_id"), TextOps.simhashUdf(TextOps.tokens("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ham(hs(0L), hs(1L)) <= 6, s"near-dup hamming ${ham(hs(0L), hs(1L))}")
    assert(ham(hs(0L), hs(2L)) > 10, s"unrelated hamming ${ham(hs(0L), hs(2L))}")
    assert(hs(0L) == hs(4L), "simhash must be case-insensitive (lowered tokens)")
  }
}
