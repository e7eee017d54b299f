package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** annTopKFiltered — the metadata-predicate + vector-search shape (r14):
  * the predicate must apply to the CANDIDATE set before the re-rank
  * (never the result set), every hit must satisfy it, and recall vs the
  * exact filtered leg must clear the gate floor on the fixture. */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("every filtered-ANN hit carries the probe's label; recall clears the floor") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val ann = Similarity.annTopKFiltered(e, q, k = 5, filterCol = "label").collect()
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ann.nonEmpty)
    ann.foreach { r =>
      assert(labels(r.getLong(1)) == labels(r.getLong(0)),
        s"hit ${r.getLong(1)} label != probe ${r.getLong(0)} label")
    }
    // exact filtered top-5 by brute force over the collected vectors
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val annBy = ann.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0L until 10L).foreach { qid =>
      val exact = vecs.keys.filter(v => v != qid && labels(v) == labels(qid)).toSeq
        .map(v => (v, r6(cos(vecs(qid), vecs(v)))))
        .sortBy { case (v, c) => (-c, v) }.take(5).map(_._1).toSet
      val found = annBy.getOrElse(qid, Set.empty).intersect(exact).size
      assert(found * 10 >= exact.size * 4, s"qid $qid recall $found/${exact.size}")
    }
  }

  test("a candidate failing the predicate never reaches the re-rank output") {
    import spark.implicits._
    // a near-identical twin with the WRONG label must not appear even
    // though it certainly shares buckets; a same-label weaker neighbor
    // must win instead
    val dir = java.nio.file.Files.createTempDirectory("fann").toString
    def v(x0: Double, x1: Double): Array[Float] =
      Array(x0.toFloat, x1.toFloat) ++ Array.fill(6)(0.0f)
    val rows = Seq(
      (0L, v(1.0, 0.0), 1),  // probe, label 1
      (1L, v(1.0, 0.01), 2), // near-twin, WRONG label
      (2L, v(0.9, 0.3), 1),  // same label, weaker
      (3L, v(0.0, 1.0), 1),  // same label, orthogonal
      (4L, v(0.95, 0.2), 2)) // wrong label again
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.annTopKFiltered(e, e.filter(col("vec_id") === 0L),
      k = 2, filterCol = "label").collect().map(_.getLong(1)).toSet
    assert(got == Set(2L, 3L), s"filtered result: $got")
  }
}
