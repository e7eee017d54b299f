package graft.relational

import graft.text.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Image resize + histogram through the real ImageIO decode path. The
  * gate's closed-form oracles pin the values; these specs pin the
  * transform semantics directly against the codec on hand-built images.
  */
class MultimodalImageOpsSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("resizeNearest samples the even (x, y) grid of the decoded image") {
    // 5x4 image: sampled pixels are (0,0),(2,0),(4,0),(0,2),(2,2),(4,2)
    val bytes = Multimodal.syntheticBmp(7L, 5, 4)
    val r = Multimodal.resizeNearest(7L, bytes)
    assert((r.w_in, r.h_in, r.w_out, r.h_out) === ((5L, 4L, 3L, 2L)))
    val expect = (for (y <- 0 until 4 by 2; x <- 0 until 5 by 2)
      yield ((7L * 31 + y * 5 + x) % 256).toDouble).sum / 6.0
    assert(math.abs(r.mean_resized - expect) < 1e-9)
  }

  test("resizeNearest: a 1x1 image resizes to itself") {
    val bytes = Multimodal.syntheticBmp(3L, 1, 1)
    val r = Multimodal.resizeNearest(3L, bytes)
    assert((r.w_out, r.h_out) === ((1L, 1L)))
    assert(r.mean_resized === ((3L * 31) % 256).toDouble)
  }

  test("grayPixels enumerates every pixel exactly once with the closed-form value") {
    val bytes = Multimodal.syntheticBmp(11L, 4, 3)
    val px = Multimodal.grayPixels(11L, bytes).toSeq
    assert(px.length === 12)
    assert(px.forall(_._1 === 11L))
    val expect = (0 until 12).map(i => ((11L * 31 + i) % 256).toInt).sorted
    assert(px.map(_._2).sorted === expect)
  }

  test("multimodal_image_histogram: per-doc bin counts sum to the pixel count") {
    val rows = DataPipelineQueries.queries("multimodal_image_histogram")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rs) =>
      val w = 2 + (id % 7); val h = 2 + (id % 5)
      assert(rs.map(_.getLong(2)).sum === w * h, s"doc $id")
      assert(rs.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 15))
    }
  }
}
