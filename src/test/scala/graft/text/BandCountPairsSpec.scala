package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextOps.candidatePairsWithBandCounts]] — the r13 compacted candidate
  * generator — must be VALUE-identical to the classic banded self-join it
  * replaced: same pair set (pairs sharing ≥ 1 surviving ≤-cap bucket) and
  * the same per-pair shared-band multiplicity over surviving buckets, on a
  * fixture that exercises every regime: near-dups, exact dups, unrelated
  * docs, AND a swarm whose buckets exceed the cap (the masked-vector
  * branch: two ids in the same DROPPED bucket must not count that band,
  * and a pair whose EVERY shared band is dropped must not appear). */
class BandCountPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The classic construction (pre-r13 engine): bucket-keyed self-join over
    * ≤-cap buckets, pair-row multiplicity as nb — the independent reference
    * the compacted generator must reproduce bit-for-bit. */
  private def classic(sig: org.apache.spark.sql.DataFrame,
                      cap: Int): Set[(Long, Long, Long)] = {
    val buckets = sig.select(col("doc_id"),
      posexplode(col("bb")).as(Seq("band", "bucket")))
    val ok = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("sz")).filter(col("sz") <= cap)
      .select(col("band"), col("bucket"))
    val small = buckets.join(ok, Seq("band", "bucket"))
    small.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      .join(small.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def sigFrame(texts: Seq[(Long, String)]) =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.normalized("text").as("norm"))
      .withColumn("sh", TextOps.charShingles("norm", 5))
      .withColumn("sig", TextOps.minhashSigCol(col("sh"), 64))
      .withColumn("bb", TextOps.bandBucketCols(col("sig"), 16, 4))
      .select(col("doc_id"), col("bb"))

  test("compacted generator ≡ classic self-join, caps binding and not") {
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the warm windowsill and the birds sing in the garden"
    val rnd = new scala.util.Random(11)
    // 40-member swarm of EXACT dups (identical signatures → every bucket
    // size ≥ 40) + near-dups + unrelated tails
    val swarm = (100L until 140L).map(i => (i, base))
    val docsSeq = Seq(
      (0L, base), (1L, base.replace("morning", "evening")),
      (2L, "completely different content about distributed query engines " +
        "shuffling partitioned columnar data across executor nodes")) ++
      swarm ++
      (200L until 210L).map(i =>
        (i, (0 until 30).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString))
    val sig = sigFrame(docsSeq)
    for (cap <- Seq(8, 30, 256)) { // 8 and 30 DROP the 40-member swarm buckets
      val compact = TextOps.candidatePairsWithBandCounts(sig, "doc_id", "bb",
          maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ref = classic(sig, cap)
      assert(compact == ref,
        s"cap=$cap: compact ${compact.size} pairs vs classic ${ref.size}; " +
          s"diff=${(compact diff ref).take(3)} / ${(ref diff compact).take(3)}")
    }
  }

  test("a pair whose only shared buckets are dropped does not appear") {
    // two exact dups alone: every band bucket has exactly the 2 of them;
    // cap 1 drops every bucket → no pair at all
    val sig = sigFrame(Seq((0L, "identical text"), (1L, "identical text")))
    assert(TextOps.candidatePairsWithBandCounts(sig, "doc_id", "bb",
      maxBucketSize = 1).count() == 0L)
    // cap 2 keeps them: one pair, nb = 16 (all bands shared)
    val rows = TextOps.candidatePairsWithBandCounts(sig, "doc_id", "bb",
      maxBucketSize = 2).collect()
    assert(rows.length == 1 && rows(0).getLong(2) == 16L, rows.mkString(","))
  }
}
