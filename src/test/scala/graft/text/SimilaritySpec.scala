package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gate: the LSH-bucketed top-k must recall a healthy fraction
  * of the brute-force top-k on the driver's embeddings fixture, while
  * provably pruning (candidates ≪ corpus). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force cosine top-k is deterministic and self-consistent") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 5)
    val topk = Similarity.bruteForceTopK(e, q, k = 3).collect()
    assert(topk.length == 15)
    // cosine within [-1, 1]; neighbors never the query itself
    assert(topk.forall(r => math.abs(r.getDouble(2)) <= 1.000001))
    assert(topk.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("range search returns exactly the threshold-filtered pure-Scala set, boundary inclusive") {
    import spark.implicits._
    // planted angles: v(theta) = cos(theta)*e0 + sin(theta)*e1, float32-
    // quantized like the physical column (the round-10 ulp rule); the
    // pure-Scala recompute mirrors GraphTestUtil.cos exactly
    val dir = java.nio.file.Files.createTempDirectory("simrange").toString
    val thetas = Seq(0.0, 0.3, 0.6, 0.9, 1.2, 1.5, 2.2, 3.0)
    val rows = (0L, Array(1.0f) ++ Array.fill(7)(0.0f), 0) +: thetas.zipWithIndex.map {
      case (t, i) =>
        val v = Array(math.cos(t).toFloat, math.sin(t).toFloat) ++ Array.fill(6)(0.0f)
        ((i + 1).toLong, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.bruteForceRange(e, e.filter(col("vec_id") === 0L), 0.3)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = rows.map { case (id, v, _) => id -> v.map(_.toDouble) }.toMap
    val want = byId.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, r6(cosD(byId(0L), v))) }
      .filter(_._2 >= 0.3).sortBy(_._1)
    assert(got == want, s"got=$got want=$want")
    // the fixture is discriminating: some in, some out
    assert(want.nonEmpty && want.size < thetas.size)
  }

  test("annRange: subset of exact range with identical cosines, per-query recall over the gate floor") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceRange(e, q, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ann = Similarity.annRange(e, q, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // subset with IDENTICAL 6-dp cosines — the re-rank is the exact leg's
    // own expression, so any extra/misvalued row is a plumbing bug
    val exMap = exact.map(t => (t._1, t._2) -> t._3).toMap
    assert(ann.nonEmpty)
    assert(ann.forall(t => exMap.get((t._1, t._2)).contains(t._3)),
      "every ANN range hit must be an exact hit with the identical cosine")
    // per-query recall ≥ the gate floor (0.5; measured worst cell 0.75)
    val exBy = exact.groupBy(_._1).view.mapValues(_.size).toMap
    val annBy = ann.groupBy(_._1).view.mapValues(_.size).toMap
    exBy.foreach { case (qid, nEx) =>
      val nF = annBy.getOrElse(qid, 0)
      assert(nF * 10 >= nEx * 5, s"qid $qid recall $nF/$nEx under the 0.5 floor")
    }
  }

  test("annRange tight radius: a planted twin swarm is fully recalled, scattered vectors excluded") {
    import spark.implicits._
    // 20 near-twins of e0 (tiny planted perturbations, float32-quantized
    // like the physical column) plus 40 scattered vectors near-orthogonal
    // to e0; at tau = 0.9 the answer is exactly the twin set. Per-bit
    // collision at cos 0.99 is ~0.955, so missing a twin in all 8
    // seed-pinned tables has probability ~1e-6 per twin — and the seed is
    // fixed, so this is a deterministic pass, not a flake budget.
    val dir = java.nio.file.Files.createTempDirectory("annrange").toString
    val rnd = new scala.util.Random(11)
    val twins = (1 to 20).map { i =>
      val v = Array.fill(8)(0.0f)
      v(0) = 1.0f; v(1) = (0.02 * (i % 5)).toFloat; v(2) = (0.01 * (i % 3)).toFloat
      (i.toLong, v, 0)
    }
    val scattered = (21 to 60).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat)
      v(0) = 0.0f // orthogonal-ish to e0: cosine far below 0.9
      (i.toLong, v, 1)
    }
    val probe = Seq((0L, Array(1.0f) ++ Array.fill(7)(0.0f), 0))
    (probe ++ twins ++ scattered).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.annRange(e, e.filter(col("vec_id") === 0L), 0.9)
      .collect().map(_.getLong(1)).toSet
    assert(got == (1L to 20L).toSet, s"tight-radius swarm recall: $got")
  }

  test("ANN recalls most of the brute-force top-10 with far fewer comparisons") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 20)
    val n = e.count()
    val exact = Similarity.bruteForceTopK(e, q, k = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.annTopK(e, q, k = 10).collect()
    val annSets = approx.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.map { qid =>
      val got = annSets.getOrElse(qid, Set.empty)
      got.intersect(exact(qid)).size.toDouble / exact(qid).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.4, s"mean recall@10 = $meanRecall")
    // pruning evidence: every query examined well under the full corpus
    val cands = approx.map(_.getLong(3)).max
    assert(cands < n, s"candidate count $cands did not prune (corpus $n)")
  }

  test("IVF recalls most of the brute-force top-10 with cell-bounded candidates") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 20)
    val n = e.count()
    val exact = Similarity.bruteForceTopK(e, q, k = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.ivfTopK(e, q, k = 10).collect()
    val ivfSets = approx.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.map { qid =>
      ivfSets.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toDouble / exact(qid).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.4, s"IVF mean recall@10 = $meanRecall")
    assert(approx.map(_.getLong(3)).max < n, "IVF candidates did not prune")
  }

  test("PQ recalls most of the brute-force top-10 via compressed-domain ADC scan") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, q, k = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.pqTopK(e, q, k = 10, nCentroids = 64, rerank = 10).collect()
    val pqSets = approx.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.map { qid =>
      pqSets.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toDouble / exact(qid).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"PQ mean recall@10 = $meanRecall")
    // the ADC stage hands the exact re-rank at most rerank·k raw vectors —
    // n_candidates is the re-rank input size, reported per query
    assert(approx.forall(_.getLong(3) <= 10L * 10L),
      s"ADC candidate bound broken: ${approx.map(_.getLong(3)).max}")
  }

  test("a pre-fitted pqIndex reproduces the self-contained pqTopK exactly") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val idx = Similarity.pqIndex(e, k = 64)
    // code words are m small ints — the 32x memory compression is the point
    val codes = idx.codes.collect()
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 64)))
    assert(codes.forall(_.getSeq[Int](1).length == 8))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toSeq
    val direct = rows(Similarity.pqTopK(e, q, k = 5, nCentroids = 64))
    val reused = rows(Similarity.pqTopK(e, q, k = 5, nCentroids = 64, index = Some(idx)))
    assert(reused == direct, "index-reuse path diverged from the self-contained fit")
  }

  test("a pre-fitted ivfIndex reproduces the self-contained ivfTopK exactly") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val idx = Similarity.ivfIndex(e)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toSeq
    val direct = rows(Similarity.ivfTopK(e, q, k = 5))
    val reused = rows(Similarity.ivfTopK(e, q, k = 5, index = Some(idx)))
    assert(reused == direct, "index-reuse path diverged from the self-contained fit")
    // and a second batch against the same index (the amortization case)
    val q2 = e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
    assert(rows(Similarity.ivfTopK(e, q2, k = 5, index = Some(idx))).nonEmpty)
  }

  test("IVF+PQ recalls most of the brute-force top-10 scanning only probed cells") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 20)
    val n = e.count()
    val exact = Similarity.bruteForceTopK(e, q, k = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.ivfpqTopK(e, q, k = 10, nProbe = 6,
      nCentroids = 64, rerank = 10).collect()
    val sets = approx.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.map { qid =>
      sets.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toDouble / exact(qid).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.3, s"IVF+PQ mean recall@10 = $meanRecall")
    // composed pruning: the re-rank input is ADC-bounded AND the ADC scan
    // itself is cell-bounded (strictly under the corpus)
    assert(approx.forall(_.getLong(3) <= 10L * 10L),
      s"re-rank bound broken: ${approx.map(_.getLong(3)).max}")
    assert(approx.map(_.getLong(4)).max < n,
      s"ADC scan did not prune: ${approx.map(_.getLong(4)).max} of $n")
  }

  test("IVF+PQ scanned code rows stay within the nProbe/nCells fraction") {
    import spark.implicits._
    // 8 well-separated clusters of 100 vectors each: the coarse quantizer
    // recovers them, so with nCells = 8, nProbe = 2 each query's ADC scan
    // must touch ~2/8 of the corpus — assert ≤ 1.5x that fraction (KMeans
    // may split one cluster and merge two others; separation keeps the
    // deviation small)
    val rnd = new scala.util.Random(7)
    val centers = Array.tabulate(8, 16)((c, j) => math.sin(c * 37 + j) * 10.0)
    val vecs = (0 until 800).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(16)(j => (centers(c)(j) + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 8)
    val res = Similarity.ivfpqTopK(df, q, k = 3, nCells = 8, nProbe = 2,
      m = 8, nCentroids = 16, dim = 16).collect()
    val maxScanned = res.map(_.getLong(4)).max
    val bound = (800.0 * 2 / 8 * 1.5).toLong
    assert(maxScanned <= bound, s"scanned $maxScanned > bound $bound (nProbe/nCells broken)")
    // and the probe finds the right cluster: each query's top-1 is a member
    // of its own cluster (ids ≡ qid mod 8)
    val top1 = res.groupBy(_.getLong(0)).view.mapValues(_.minBy(-_.getDouble(2))).toMap
    top1.foreach { case (qid, r) =>
      assert(r.getLong(1) % 8 == qid % 8, s"query $qid top-1 ${r.getLong(1)} left its cluster")
    }
  }

  test("a pre-fitted ivfPqIndex reproduces the self-contained ivfpqTopK exactly") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val idx = Similarity.ivfPqIndex(e, k = 64)
    val codes = idx.coded.collect()
    assert(codes.forall(_.getSeq[Int](2).forall(c => c >= 0 && c < 64)))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toSeq
    val direct = rows(Similarity.ivfpqTopK(e, q, k = 5, nCentroids = 64))
    val reused = rows(Similarity.ivfpqTopK(e, q, k = 5, nCentroids = 64, index = Some(idx)))
    assert(reused == direct, "index-reuse path diverged from the self-contained fit")
  }

  test("identical-vector swarm: bucket cap bounds candidates, geometry adapts") {
    import spark.implicits._
    // 500 copies of ONE vector + 40 distinct vectors: without the bucket cap
    // the swarm shares every (tbl, code) bucket with itself → ~500² candidate
    // rows; with the cap those buckets are dropped entirely
    val swarm = (0 until 500).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(j + 1).toFloat).toSeq)
    }
    val distinct = (500 until 540).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.cos(i * 16 + j).toFloat).toSeq)
    }
    val df = (swarm ++ distinct).toDF("vec_id", "embedding")
    val tables = 4
    val res = Similarity.annTopK(df, df, k = 1, tables = tables, dim = 16,
      maxBucketSize = 64).collect()
    val bits = Similarity.adaptiveBits(540)
    // every bucket holding the swarm exceeds the cap and is dropped, so NO
    // query may see more candidates than tables·(bits+1) probed buckets of
    // ≤64 members each — far below the 500-strong swarm
    val worst = res.map(_.getLong(3)).max
    assert(worst <= tables.toLong * (bits + 1) * 64,
      s"candidate bound violated: $worst")
    assert(worst < 500, s"swarm leaked into candidates: $worst")
  }

  test("a zero-norm embedding is never anyone's neighbor (cosine pinned, not NaN)") {
    import spark.implicits._
    // NaN orders above every double in Spark, so an unguarded 0/0 cosine
    // would put the zero vector at rank 1 of every query's top-k
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 16 + j + 1).toFloat).toSeq)
    } :+ (20L, Seq.fill(16)(0.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df.filter(col("vec_id") < 5), k = 3).collect()
    assert(top.forall(r => r.getLong(1) != 20L), "zero vector leaked into a top-k")
    assert(top.forall(r => !r.getDouble(2).isNaN), "NaN cosine leaked into results")
    // and the zero vector's own row scores everything at -1, not NaN
    val own = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 20L), k = 3).collect()
    assert(own.forall(r => r.getDouble(2) == -1.0), own.mkString(","))
  }

  test("adaptiveBits grows with the corpus and stays clamped") {
    assert(Similarity.adaptiveBits(100) == 4)
    assert(Similarity.adaptiveBits(64L << 10) == 10)
    assert(Similarity.adaptiveBits(64L << 30) == 24) // clamp
    assert(Similarity.adaptiveBits(0) == 4)
  }

  test("nearDupPairs: exact dup always collides; swarm buckets stay capped") {
    import spark.implicits._
    val base = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 16 + j).toFloat).toSeq)
    }
    val withDup = base :+ (50L, base.head._2) // identical vector ⇒ identical codes
    val pairs = Similarity.nearDupPairs(withDup.toDF("vec_id", "embedding"),
      minCosine = 0.99, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 50L)), s"planted exact dup not paired: $pairs")
    // identical-vector swarm: every bucket it fills exceeds the cap and is
    // dropped BEFORE the self-join — the documented recall-for-bound trade
    val swarm = (0L until 400L).map(i => (i, base.head._2)).toDF("vec_id", "embedding")
    assert(Similarity.nearDupPairs(swarm, minCosine = 0.99, dim = 16,
      maxBucketSize = 100).count() == 0L)
    assert(Similarity.nearDupPairs(swarm, minCosine = 0.99, dim = 16,
      maxBucketSize = 500).count() > 0L)
  }

  test("embedding dedup query: identical-vector swarm keeps its duplicates despite the cap") {
    import spark.implicits._
    // 400 bit-identical vectors — far above nearDupPairs' bucket cap. They
    // collapse to one representative before the LSH self-join, so every
    // member keeps a cosine-1.0 partner (pre-collapse, the swarm shared all
    // its buckets and the cap dropped every pair — the exact failure the
    // brute-force DuckDB oracle would now catch)
    val v = Array.tabulate(64)(j => math.sin(j + 1).toFloat).toSeq
    val rows = (0L until 400L).map(i => (i, v, "swarm")) ++
      (400 until 440).map(i =>
        (i.toLong, Array.tabulate(64)(j => math.cos(i * 64 + j).toFloat).toSeq, "x"))
    val dir = java.nio.file.Files.createTempDirectory("emb_swarm").toString
    rows.toDF("vec_id", "embedding", "label").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = graft.relational.DataPipelineQueries.queries("dedup_embedding")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    (0L until 400L).foreach { i =>
      val (dup, c) = out(i)
      assert(dup >= 0 && dup < 400 && dup != i && c == 1.0,
        s"swarm vec $i lost its duplicate: ${out(i)}")
    }
  }

  test("empty-probe queries keep their row: null neighbor, zero candidates") {
    import spark.implicits._
    // a 1-vector corpus queried by itself: every candidate is the self-row
    // and gets filtered — before the left-join fix these queries vanished
    // from the output entirely (silent row loss for library callers)
    val emb = Array.tabulate(64)(j => math.sin(j + 1).toFloat).toSeq
    val v = Seq((0L, emb)).toDF("vec_id", "embedding")
    def assertKept(df: org.apache.spark.sql.DataFrame): Unit = {
      val r = df.collect()
      assert(r.length == 1, s"query row lost or duplicated: ${r.mkString(",")}")
      assert(r(0).getLong(0) == 0L && r(0).isNullAt(1) && r(0).isNullAt(2)
        && r(0).getLong(3) == 0L, s"unexpected empty-probe row: ${r(0)}")
    }
    assertKept(Similarity.annTopK(v, v, k = 3))
    assertKept(Similarity.pqTopK(v, v, k = 3))
    // the IVF family needs MLlib's k >= 2: two antipodal vectors land in
    // their own cells, so vec 0 probing ONLY its own cell (nProbe = 1)
    // still self-filters to an empty candidate set
    val v2 = Seq((0L, emb), (1L, emb.map(-_))).toDF("vec_id", "embedding")
    val q0 = v2.filter(col("vec_id") === 0L)
    assertKept(Similarity.ivfTopK(v2, q0, k = 3, nCells = 2, nProbe = 1))
    val ivfpq = Similarity.ivfpqTopK(v2, q0, k = 3, nCells = 2, nProbe = 1)
    assertKept(ivfpq)
    assert(ivfpq.collect()(0).getLong(4) == 0L, "n_scanned must be 0")
  }

  test("similarity_index_reuse: serve batches run no KMeans and cost less than the fit") {
    // the registered gate query carries its own scheduler evidence — the
    // verdict booleans ARE the no-re-fit assertion (VERDICT r6 ask #7)
    val rows = graft.relational.DataPipelineQueries
      .queries("similarity_index_reuse")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 10, s"expected 10 batch-2 query rows, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) == 5L, s"n_returned: $r")
      assert(r.getBoolean(2), s"found_true_neighbor: $r")
      assert(r.getBoolean(3), s"fit_ran_kmeans (probe broken): $r")
      assert(r.getBoolean(4), s"serve_no_kmeans (re-fit happened): $r")
      assert(r.getBoolean(5), s"serve_cheaper_than_fit: $r")
      assert(r.getBoolean(6), s"batch1_complete: $r")
    }
  }

  test("embedding near-dup: a duplicated vector is found at cosine ~1") {
    import spark.implicits._
    // plant an exact duplicate pair in a small synthetic corpus
    val vecs = (0 until 50).map { i =>
      val v = Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat)
      (i.toLong, v.toSeq)
    } :+ (50L, Array.tabulate(64)(j => math.sin(0 * 64 + j).toFloat).toSeq)
    val df = vecs.toDF("vec_id", "embedding")
    val near = Similarity.annTopK(df, df, k = 1)
      .filter(col("cosine") >= 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((0L, 50L)) && near.contains((50L, 0L)),
      s"planted duplicate not found: $near")
  }
}
