package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural contract of the SemDeDup-style pruning beyond the value
  * hash: every dropped vector really has a lower-id cell-mate above τ
  * (recomputed driver-side from raw embeddings), every kept one doesn't,
  * and the canonical (minimum-id) member of each cell always survives. */
class DedupSemanticSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dedup_semantic: drop set matches a driver-side cosine recompute; cell minima survive") {
    val rows = EmbedQueries.queries("dedup_semantic")(spark, sf).collect()
    assert(rows.nonEmpty)
    val kept = rows.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.exists(!_.getBoolean(2)), "τ must genuinely drop on the fixture")
    // the lowest id in each cell can have no lower-id neighbor: always kept
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      val minId = rs.map(_.getLong(0)).min
      assert(kept(minId), s"cell minimum $minId must survive")
    }
    // driver recompute of within-cell cosines from the raw embeddings
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosR(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = rows.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).sorted)
    rows.foreach { r =>
      val id = r.getLong(0)
      val mates = byCell(cellOf(id)).filter(_ < id)
      val hasCloseLower = mates.exists(m => cosR(embs(id), embs(m)) >= 0.35)
      assert(r.getBoolean(2) === !hasCloseLower,
        s"vec $id kept=${r.getBoolean(2)} disagrees with recomputed neighborhood")
    }
  }
}
