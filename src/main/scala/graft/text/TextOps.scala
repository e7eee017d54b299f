package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Text-dedup building blocks for the training-data-pipeline surface:
  * normalization, character shingles, MinHash signatures with LSH banding,
  * and SimHash — the standard large-corpus near-dup stack (shingle → minhash
  * → band → bucket-join; never all-pairs).
  *
  * Scale design: every candidate-generation step is a key-partitioned
  * shuffle on (band, bucket); hot buckets (degenerate near-identical swarms)
  * are capped by `maxBucketSize` so no join side goes quadratic. The only
  * UDFs are per-row signature kernels (O(shingles·hashes)), the same shape
  * as the Llk kernel.
  */
object TextOps {

  /** lower + trim + collapse whitespace — the canonical form exact dedup
    * hashes (same expression the DuckDB oracle uses). */
  def normalized(textCol: String): Column =
    regexp_replace(lower(trim(col(textCol))), "\\s+", " ")

  /** Distinct character k-grams of a (pre-normalized) column. Short texts
    * (< k chars) degrade to a single truncated shingle via the greatest()
    * floor — sequence() would otherwise run DESCENDING for a negative span. */
  def charShingles(textCol: String, k: Int): Column =
    expr(s"array_distinct(transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)), " +
      s"i -> substring($textCol, i, $k)))")

  /** Word tokens: maximal ASCII-alpha runs of the lowercased text (matches
    * the oracle's regexp_extract_all semantics). */
  def tokens(textCol: String): Column =
    expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")

  /** MinHash signature: numHashes permutation-min values over the shingle
    * set, hᵢ(s) = (aᵢ·murmur3(s) + bᵢ) mod 2⁶³ with (aᵢ, bᵢ) drawn once from
    * `seed` — deterministic across runs and executors. */
  def minhashSigUdf(numHashes: Int, seed: Long): UserDefinedFunction = {
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(numHashes)(rnd.nextLong() | 1L) // odd multipliers
    val bs = Array.fill(numHashes)(rnd.nextLong())
    udf { shingles: Seq[String] =>
      val sig = Array.fill(numHashes)(Long.MaxValue)
      shingles.foreach { s =>
        val h = MurmurHash3.stringHash(s).toLong & 0xffffffffL
        var i = 0
        while (i < numHashes) {
          val v = (as(i) * h + bs(i)) & Long.MaxValue
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      sig.toSeq
    }
  }

  /** LSH banding: signature → one bucket id per band (hash of the band's
    * `rowsPerBand` slice). Docs sharing ANY band bucket become candidates —
    * P(candidate) = 1 − (1 − s^r)^b for Jaccard s. */
  def bandBucketsUdf(bands: Int, rowsPerBand: Int): UserDefinedFunction =
    udf { sig: Seq[Long] =>
      (0 until bands).map { b =>
        MurmurHash3.orderedHash(sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand), b).toLong
      }
    }

  /** 64-bit SimHash over the token bag: per-token 64-bit murmur votes on
    * each bit; near-dups differ in few bits (checked via bit_count(xor)). */
  def simhashUdf: UserDefinedFunction = udf { tokens: Seq[String] =>
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h1 = MurmurHash3.stringHash(t, 0x9747b28c)
      val h2 = MurmurHash3.stringHash(t, 0x85ebca6b)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** (id, band, bucket) rows from (id, sig). */
  def bandBuckets(df: DataFrame, idCol: String, sigCol: String,
                  bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol),
      posexplode(bandBucketsUdf(bands, rowsPerBand)(col(sigCol))).as(Seq("band", "bucket")))

  /** Distinct candidate pairs (a < b) sharing a band bucket. Buckets larger
    * than `maxBucketSize` are dropped BEFORE the self-join — the bound that
    * keeps a pathological swarm of identical docs from going quadratic
    * (members of a dropped bucket still pair up in their other bands). */
  def candidatePairs(buckets: DataFrame, idCol: String,
                     maxBucketSize: Int = 256): DataFrame = {
    val ok = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val small = buckets.join(ok, Seq("band", "bucket"))
    val a = small.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = small.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }
}
