package graft.relational

/** Pure-Scala (collections, no Spark, no SQL) recompute of the graph
  * family's bucketed ANN k-NN edge build — a THIRD independent
  * implementation beside the Catalyst plan (AnalyticsQueries.annKnnEdges)
  * and the DuckDB oracle fragment (annEdgesCteSql), used by the graph
  * specs' driver recomputes. Geometry mirrors the engine constants:
  * 8 tables, adaptive bits targeting 64/bucket, 512 bucket cap,
  * md5-parity ±1 hyperplanes, Hamming-radius-1 multiprobe, rounded-cosine
  * top-k re-rank with ties to the smaller id.
  */
object GraphTestUtil {
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    // sqrt(na)·sqrt(nb), NOT sqrt(na·nb): the engine's Similarity.cosine
    // divides by the product of the two square roots, and the two forms
    // differ by an ulp — enough to flip a 6-dp rounding boundary
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def md5Sign(t: Int, b: Int, i1: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${t}_${b}_${i1}".getBytes("UTF-8"))
    if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
  }

  /** Adaptive code width — same integer-exact rule as the engine. */
  def bitsFor(n: Long): Int = {
    var b = 4
    while (b < 24 && n > 64L * (1L << b)) b += 1
    b
  }

  /** Per-(vector, table) sign codes with the sign table memoized once —
    * md5 depends only on (t, b, i), so a fresh digest per component would
    * cost |emb|·tables·bits·dim digests for no reason. */
  def annCodes(emb: Map[Long, Array[Double]], tables: Int, bits: Int): Map[(Long, Int), Long] = {
    val dim = emb.values.map(_.length).max
    val signs = Array.tabulate(tables, bits, dim)((t, b, i) => md5Sign(t, b, i + 1))
    (for {
      (v, arr) <- emb.toSeq; t <- 0 until tables
    } yield {
      var code = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        while (i < arr.length) { dot += arr(i) * signs(t)(b)(i); i += 1 }
        if (dot >= 0) code |= (1L << b)
        b += 1
      }
      (v, t) -> code
    }).toMap
  }

  /** Directed top-`k` ANN edges exactly as the engine and oracle build
    * them; a node whose candidates are empty is absent from the map. */
  def annEdges(emb: Map[Long, Array[Double]], k: Int = 3): Map[Long, Seq[Long]] =
    annEdgesCos(emb, k).view.mapValues(_.map(_._1)).toMap

  /** [[annEdges]] keeping the rounded cosine per edge — the weight the
    * materialized edge table carries for sssp. */
  def annEdgesCos(emb: Map[Long, Array[Double]], k: Int = 3): Map[Long, Seq[(Long, Double)]] = {
    val n = emb.size
    val bits = bitsFor(n)
    val tables = 8
    val codes = annCodes(emb, tables, bits)
    val buckets: Map[(Int, Long), Seq[Long]] = codes.toSeq
      .groupBy { case ((_, t), c) => (t, c) }
      .view.mapValues(_.map(_._1._1)).toMap
      .filter(_._2.size <= 512)
    emb.keys.flatMap { v =>
      val cands = (for {
        t <- 0 until tables
        own = codes((v, t))
        // a node probes from a table only if its OWN bucket survived the cap
        if buckets.contains((t, own))
        probe <- own +: (0 until bits).map(b => own ^ (1L << b))
        dst <- buckets.getOrElse((t, probe), Seq.empty)
        if dst != v
      } yield dst).toSet
      if (cands.isEmpty) None
      else Some(v -> cands.toSeq
        .map(d => (d, r6(cos(emb(v), emb(d)))))
        .sortBy { case (d, c) => (-c, d) }.take(k).map { case (d, c) => (d, c) })
    }.toMap
  }
}
