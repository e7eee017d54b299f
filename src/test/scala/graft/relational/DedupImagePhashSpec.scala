package graft.relational

import graft.text.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash contracts beyond the value hash: the PNG round trip is
  * lossless (the premise of the closed-form oracle), every planted
  * near-dup pair surfaces (a recall FLOOR — banding may not lose a ≤3-bit
  * pair), and nothing else does at this corpus size. */
class DedupImagePhashSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pngFromPixels round-trips exactly through the real codec") {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    val px = Array.tabulate(8, 8) { (y, x) =>
      mdig.digest(s"7:$y:$x".getBytes("UTF-8"))(0) & 0xff
    }
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.pngFromPixels(px)))
    assert(img.getWidth === 8 && img.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((img.getRGB(x, y) & 0xff) === px(y)(x), s"pixel ($x,$y) changed in transit")
  }

  test("dedup_image_phash: every planted pair surfaces within Hamming 3; no false pairs") {
    val rows = DataPipelineQueries.queries("dedup_image_phash")(spark, sf).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val docIds = Tables.tbl(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val planted = docIds.filter(id => id % 50 == 0 && id > 0 && docIds(id - 1))
      .map(id => (id - 1, id))
    planted.foreach(p => assert(pairs(p), s"planted pair $p missed — recall floor broken"))
    assert(pairs === planted, "no chance collisions expected at this corpus size")
    rows.foreach(r => assert(r.getLong(2) <= 3L))
  }
}
