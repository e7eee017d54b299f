package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{UserDefinedFunction, Window}
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

  /** Canonical key of a shingle SET: md5 over the sorted elements joined
    * on a \\u0001 separator (injective unless an element contains that
    * control char — charShingles output over real text never does — and up
    * to md5 collision, the same assumption dedup_exact already makes). Docs sharing a key have Jaccard
    * 1.0 by construction, which lets dedup pipelines collapse
    * identical-shingle swarms to one representative BEFORE any pairwise
    * join. */
  def shingleSetKey(shCol: Column): Column =
    md5(concat_ws("\u0001", array_sort(shCol)))

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

  /** 64-bit SimHash over the token bag: per-token 64-bit hash votes on each
    * bit; near-dups differ in few bits (checked via bit_count(xor)).
    *
    * The token hash is the BIG-ENDIAN first 8 bytes of md5(token) — i.e.
    * the first 16 hex digits — NOT a JVM-private mixer: like
    * [[graft.core.Pfsa.hashUniform]], choosing a hash both engines compute
    * identically is what lets the DuckDB gate recompute the ENTIRE simhash
    * pipeline (codes, band collisions, hamming distances) value-for-value
    * in SQL. md5 costs more per token than murmur; the cross-engine
    * replayability is the trade, and the UDF is already off the 100-TB hot
    * path (one call per doc, not per pair). */
  def simhashUdf: UserDefinedFunction = udf { tokens: Seq[String] =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val d = md.digest(t.getBytes("UTF-8")) // digest() resets for the next token
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
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

  /** EXACT-complete candidate pairs for Jaccard ≥ `t` — prefix filtering
    * (the AllPairs/PPJoin family), the deterministic alternative to banding:
    * tokens get a global total order by ascending document frequency (ties
    * by token); a doc's PREFIX is its first ⌊(1−t)·n⌋+1 tokens in that
    * order. Any pair with J ≥ t shares ≥ ⌈t·n⌉ tokens, which cannot all fit
    * in either doc's suffix of length ⌈t·n⌉−1, so the smallest common token
    * sits in BOTH prefixes — joining on prefix tokens misses nothing
    * (unlike LSH banding's probabilistic catch).
    *
    * Scale shape: prefix join buckets are per-token doc lists, and a token
    * only enters prefixes when it is among a doc's RAREST (1−t) fraction —
    * corpus-hot tokens sort last and drop out — so candidate volume tracks
    * the true near-dup structure, not the corpus size. (A swarm of mutual
    * near-dups is still quadratic, but there the OUTPUT is quadratic —
    * no candidate generator can beat its own answer size.)
    *
    * When the caller's output semantics already restrict pairs to a BLOCK
    * (e.g. same (source, lang)), pass those columns via `blockCols` (they
    * must be constant per doc and present on `toks`): the block then joins
    * as part of the bucket key, so per-token buckets shrink from
    * corpus-sized to block-sized — the fix for low-vocabulary corpora where
    * every token is common and prefix rarity alone cannot prune (this
    * fixture: ~380 distinct trigrams across all docs, but ~100 blocks).
    * Completeness is unaffected: a qualifying pair shares its block by
    * definition, so its g* token still collides.
    *
    * @param toks (id, g) rows, one per DISTINCT token per doc, plus any
    *             `blockCols`
    */
  def prefixCandidates(toks: DataFrame, idCol: String, t: Double,
                       blockCols: Seq[String] = Nil): DataFrame = {
    val sizes = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val dfreq = toks.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("df"), col("g"))
    val ranked = toks.join(dfreq, "g")
      .withColumn("rn", row_number().over(w))
      .join(sizes, idCol)
    // asymmetric prefixes (PPJoin): the INDEX prefix ⌊(1−t)n⌋+1 is what the
    // smallest common token of any qualifying pair must fall into on the
    // LARGER doc; the SMALLER doc a needs overlap α ≥ 2t/(1+t)·n_a (since
    // α ≥ t/(1+t)(n_a+n_b) and n_b ≥ n_a), so its PROBE prefix shrinks to
    // ⌊(1−t)/(1+t)·n⌋+1 — n/3 at t=0.5 — and, being the rarest head of the
    // df order, it collides far less than the full index prefix
    // the +1e-9 / -1e-9 nudges guard the fp products at exact-integer
    // boundaries: both floors may only round UP (longer prefixes) and the
    // overlap ceil below may only round DOWN (weaker filter) — each slip adds
    // candidates the exact verify discards, never loses one, so the
    // completeness guarantee holds for arbitrary t, not just t = 0.5
    val blk = blockCols.map(col)
    val index = ranked
      .filter(col("rn") <= floor(lit(1.0 - t) * col("n") + lit(1e-9)) + lit(1))
      .select(col(idCol) +: col("g") +: col("n") +: col("rn") +: blk: _*)
    val probe = ranked
      .filter(col("rn") <= floor(lit((1.0 - t) / (1.0 + t)) * col("n") + lit(1e-9)) + lit(1))
      .select(col(idCol) +: col("g") +: col("n") +: col("rn") +: blk: _*)
    // join on the 32-bit murmur of the token, not the string: cheaper to
    // shuffle and compare; a hash collision can only ADD candidates (the
    // exact-similarity verify downstream discards them), never lose one
    val a = probe.select(hash(col("g")).as("gh") +: col(idCol).as("id_a") +:
      col("n").as("n_a") +: col("rn").as("rn_a") +: blk: _*)
    val b = index.select(hash(col("g")).as("gh") +: col(idCol).as("id_b") +:
      col("n").as("n_b") +: col("rn").as("rn_b") +: blk: _*)
    a.join(b, "gh" +: blockCols)
      // a is the smaller side (ties by id): each unordered pair is probed
      // exactly one way round, completeness per the prefix bounds above
      .filter((col("n_a") < col("n_b") ||
          (col("n_a") === col("n_b") && col("id_a") < col("id_b"))) &&
        // AllPairs length filter: J ≥ t ⇒ min(n_a,n_b) ≥ t·max(n_a,n_b) —
        // prunes DURING the join, before the distinct, dropping only pairs
        // the exact-Jaccard threshold would drop anyway
        least(col("n_a"), col("n_b")).cast("double") >=
          lit(t) * greatest(col("n_a"), col("n_b")) &&
        // PPJoin positional filter: J ≥ t needs overlap α = ⌈t/(1+t)·(n_a+n_b)⌉,
        // and at the SMALLEST common token (position rn in each doc's order)
        // every common token sits at position ≥ rn in both docs, so overlap
        // ≤ 1 + min(n_a−rn_a, n_b−rn_b). The g* row of a qualifying pair
        // always passes, so completeness survives; the row-level prune runs
        // BEFORE the distinct shuffle — the expensive stage on low-vocabulary
        // corpora where the prefix join fans out
        lit(1) + least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) >=
          ceil(lit(t / (1.0 + t)) * (col("n_a") + col("n_b")) - lit(1e-9)))
      // canonical (smaller id first) regardless of which side probed
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** Near-dup pairs among DISTINCT simhash codes: 4×16-bit band buckets (any
    * two codes within Hamming distance `maxHamming` ≤ 3 MUST share a band —
    * pigeonhole over 4 bands), verified with bit_count(xor). The join domain
    * is distinct codes, NOT docs: an identical-doc swarm (one code shared by
    * millions of rows) collapses to a single row before banding, so the
    * quadratic blowup of a code-popularity skew never reaches the join.
    * Residual hot buckets — many DISTINCT codes sharing a 16-bit band chunk —
    * are dropped at `maxBucketSize` (trading the pigeonhole guarantee for the
    * bound on those codes only; they still pair through their other bands).
    *
    * @param codes one row per distinct simhash (column `simhash`)
    * @return (h_a, h_b, hamming), h_a < h_b (signed order — just the
    *         pair canonicalization)
    */
  def simhashCodePairs(codes: DataFrame, maxHamming: Int = 3,
                       maxBucketSize: Int = 256): DataFrame = {
    val banded = codes.select(col("simhash"),
      posexplode(expr(
        // & 65535, NOT % 65536: for band 0 the unshifted simhash is the
        // raw signed long, and % follows the dividend's sign — a
        // negative code's low-16 chunk came out negative and landed in a
        // different bucket than the same bits on a positive code, so a
        // pair whose ONLY shared band was band 0 with one negative
        // member was silently missed (surfaced by the sf0.1 full-verify
        // sweep against the oracle's `& 65535`; invisible at sf0.01,
        // where every close pair happened to share a correctly-banded
        // chunk too)
        "transform(sequence(0, 3), b -> shiftrightunsigned(simhash, cast(b * 16 as int)) & 65535)"))
        .as(Seq("band", "code")))
    val ok = banded.groupBy(col("band"), col("code"))
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= maxBucketSize)
      .select(col("band"), col("code"))
    val small = banded.join(ok, Seq("band", "code"))
    val a = small.select(col("band"), col("code"), col("simhash").as("h_a"))
    val b = small.select(col("band"), col("code"), col("simhash").as("h_b"))
    a.join(b, Seq("band", "code"))
      .filter(col("h_a") < col("h_b"))
      .select(col("h_a"), col("h_b")).distinct()
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Distinct candidate pairs (a < b) sharing a band bucket. Buckets larger
    * than `maxBucketSize` are dropped BEFORE the self-join — the bound that
    * keeps a pathological swarm of identical docs from going quadratic
    * (members of a dropped bucket still pair up in their other bands). */
  def candidatePairs(buckets: DataFrame, idCol: String,
                     maxBucketSize: Int = 256): DataFrame =
    candidatePairsRaw(buckets, idCol, maxBucketSize).distinct()

  /** [[candidatePairs]] WITHOUT the cross-band dedup: a pair sharing k band
    * buckets appears k times (1 ≤ k ≤ bands). Callers that apply a cheap
    * per-pair filter right away should prefer this and `.distinct()` AFTER
    * filtering — the banding noise floor (200k+ candidate rows on the
    * word-soup fixture vs 5k survivors) then never pays a pair-sized
    * exchange, and the duplicate filter evaluations are bounded by the band
    * count. */
  def candidatePairsRaw(buckets: DataFrame, idCol: String,
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
  }

  /** Count of agreeing positions between two equal-length MinHash
    * signatures — the estimated-Jaccard kernel of the two-stage verify. A
    * hand loop, NOT `aggregate(zip_with(...))`: the Catalyst HOF pair
    * allocates an intermediate array and interprets its lambda per element,
    * which the r8 profile put at a large share of dedup_minhash's cost on
    * the 200k-row banding noise floor; this JIT-compiled loop does the same
    * 64 comparisons allocation-free. */
  val sigAgreeUdf: UserDefinedFunction = udf { (a: Seq[Long], b: Seq[Long]) =>
    val n = math.min(a.length, b.length)
    var agree = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) agree += 1; i += 1 }
    agree
  }
}
