package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dedup_embedding_decontaminate — the embedding-space benchmark screen
  * (r13 verdict ask #7): a planted PARAPHRASE pair (near-identical vectors,
  * the leak lexical MinHash containment cannot see) must be flagged and
  * attributed to its benchmark source; orthogonal corpus vectors stay
  * clean; and on the real fixture the engine's argmax equals a pure-Scala
  * brute-force recompute (float32-quantized reference copies, the
  * round-10 ulp rule). */
class EmbedDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cosD(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("planted paraphrase pair is flagged and attributed; orthogonal vectors stay clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("embdecon").toString
    def v(xs: (Int, Double)*): Array[Float] = {
      val a = Array.fill(8)(0.0f); xs.foreach { case (i, x) => a(i) = x.toFloat }; a
    }
    val rows = Seq(
      (0L, v(2 -> 1.0), 0),           // bench: e2
      (10L, v(0 -> 1.0), 0),          // bench: e0
      (1L, v(0 -> 1.0, 1 -> 0.05), 0), // corpus: paraphrase of bench 10
      (2L, v(3 -> 1.0), 0),           // corpus: orthogonal to both benches
      (11L, v(2 -> 0.6, 3 -> 0.8), 0) // corpus: 0.6-cosine to bench 0
    )
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = DataPipelineQueries.queries("dedup_embedding_decontaminate")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 11L), s"corpus rows: ${got.keySet}")
    // the paraphrase: attributed to bench 10 at cosine ~0.9988, flagged
    assert(got(1L)._1 == 10L && got(1L)._2 > 0.99 && got(1L)._3, s"paraphrase: ${got(1L)}")
    // orthogonal: both benches tie at cosine 0 — smaller bid 0 wins; clean
    assert(got(2L)._1 == 0L && got(2L)._2 == 0.0 && !got(2L)._3, s"orthogonal: ${got(2L)}")
    // the 0.6-cosine vector crosses the 0.45 line, attributed to bench 0
    assert(got(11L)._1 == 0L && math.abs(got(11L)._2 - 0.6) < 0.001 && got(11L)._3,
      s"mid-band: ${got(11L)}")
  }

  test("engine argmax equals a pure-Scala brute-force recompute on the fixture") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val bench = e.filter(_._1 % 10 == 0)
    val expected = e.filter(_._1 % 10 != 0).map { case (id, emb) =>
      val best = bench.toSeq
        .map { case (bid, be) => (bid, r6(cosD(be, emb))) }
        .minBy { case (bid, c) => (-c, bid) }
      id -> (best._1, best._2, best._2 >= DataPipelineQueries.EmbedDecontamTau)
    }
    val got = DataPipelineQueries.queries("dedup_embedding_decontaminate")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(got == expected, "best-partner attribution, cosine and verdict all match")
    // the fixture discriminates: at least one contaminated, most clean
    assert(got.values.count(_._3) >= 1 && got.values.count(!_._3) > got.size / 2)
  }
}
