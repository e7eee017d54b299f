package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing contract: binary payload + metadata struct in,
  * fixed decoded schema out, deterministic stub values, partition-batched
  * execution. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world", "en", "src0", 11L),
    (1L, "", "en", "src1", 0L),
    (2L, "ABC", "de", "src2", 3L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("binary table carries payload bytes + typed metadata") {
    val bt = Multimodal.asBinaryTable(docs)
    assert(bt.schema("payload").dataType.typeName == "binary")
    val r = bt.filter(col("doc_id") === 0L).select(octet_length(col("payload")), col("meta.lang")).head()
    assert(r.getInt(0) == 11 && r.getString(1) == "en")
  }

  test("decode stub is deterministic and matches a hand computation") {
    val out = Multimodal.decodeAll(spark, Multimodal.asBinaryTable(docs))
      .collect().map(d => d.doc_id -> d).toMap
    // "hello world": h=0x68 → width 16+(0x68%16)*4 = 48; e=0x65 → height 16+5*4=36
    assert(out(0L).width == 48 && out(0L).height == 36)
    assert(out(0L).n_bytes == 11)
    assert(out(0L).header_hex == "68656C6C6F20776F")
    val mean = "hello world".getBytes.map(_ & 0xff).sum.toDouble / 11
    assert(math.abs(out(0L).mean_byte - mean) < 1e-6)
    // empty payload degrades gracefully
    assert(out(1L).n_bytes == 0 && out(1L).mean_byte == 0.0)
    // re-run → identical (determinism)
    val again = Multimodal.decodeAll(spark, Multimodal.asBinaryTable(docs))
      .collect().map(d => d.doc_id -> d).toMap
    assert(again == out)
  }

  test("decode runs per-partition (mapPartitions plumbing survives repartition)") {
    val many = (0L until 100L).map(i => (i, s"payload number $i", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(7)
    val out = Multimodal.decodeAll(spark, Multimodal.asBinaryTable(many))
    assert(out.count() == 100L)
    assert(out.select(countDistinct(col("doc_id"))).head().getLong(0) == 100L)
  }

  test("real codec: a hand-built 2x2 BMP decodes to exact pixels via ImageIO") {
    // hand-rolled 24-bit BMP, 2x2, gray pixels (row-major, top-down values):
    //   (0,0)=10 (1,0)=20
    //   (0,1)=30 (1,1)=40
    // BMP stores rows bottom-up with rows padded to 4 bytes (2*3=6 → pad 2)
    def px(v: Int) = Seq(v, v, v) // B, G, R
    val pixelData = (px(30) ++ px(40) ++ Seq(0, 0) ++ // bottom row first
      px(10) ++ px(20) ++ Seq(0, 0)).map(_.toByte)
    val header = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.put('B'.toByte).put('M'.toByte).putInt(54 + 16).putInt(0).putInt(54)
    header.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val bmp = header.array() ++ pixelData.toArray
    val d = Multimodal.decodeImage(7L, bmp)
    assert(d.width == 2 && d.height == 2 && d.n_pixels == 4)
    assert(d.mean_pixel == 25.0, s"mean ${d.mean_pixel}") // (10+20+30+40)/4
    // and the decoder really reads PIXELS, not our header arithmetic: the
    // raw image round-trips through ImageIO with every sample intact
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert((img.getRGB(0, 0) & 0xff) == 10 && (img.getRGB(1, 0) & 0xff) == 20)
    assert((img.getRGB(0, 1) & 0xff) == 30 && (img.getRGB(1, 1) & 0xff) == 40)
  }

  test("real codec: synthetic BMP generator round-trips through ImageIO to the closed form") {
    // same shapes the multimodal_decode_real gate query uses
    (Seq(0L, 3L, 13L, 255L, 9999L)).foreach { id =>
      val w = 2 + (id % 7).toInt
      val h = 2 + (id % 5).toInt
      val d = Multimodal.decodeImage(id, Multimodal.syntheticBmp(id, w, h))
      assert(d.width == w && d.height == h && d.n_pixels == w * h, s"doc $id dims")
      val s = (0 until w * h).map(i => ((id * 31 + i) % 256).toInt).sum
      val expect = BigDecimal(3.0 * s / (3.0 * w * h))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(d.mean_pixel == expect, s"doc $id mean ${d.mean_pixel} vs $expect")
    }
    // non-square padding case: width 3 → row 9 bytes padded to 12
    val d3 = Multimodal.decodeImage(1L, Multimodal.syntheticBmp(1L, 3, 2))
    assert(d3.width == 3 && d3.height == 2)
  }

  test("real codec: undecodable payload fails loudly, not silently") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(0L, "this is not an image".getBytes)
    }
  }

  test("multimodal_decode_real: end-to-end over a temp documents table") {
    val docsSeq = (0L until 40L).map(i => (i, "web", "en", s"doc $i"))
    val dir = java.nio.file.Files.createTempDirectory("bmp").toString
    docsSeq.toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.relational.DataPipelineQueries.queries("multimodal_decode_real")(spark, dir)
      .collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 2 + (id % 7).toInt, s"doc $id width")
      assert(r.getInt(2) == 2 + (id % 5).toInt, s"doc $id height")
    }
  }

  test("real codec: PNG round-trips the closed form exactly (lossless)") {
    Seq(0L, 3L, 13L, 255L, 9999L).foreach { id =>
      val w = 2 + (id % 7).toInt
      val h = 2 + (id % 5).toInt
      val d = Multimodal.decodeImage(id, Multimodal.syntheticImage(id, w, h, "png"))
      assert(d.width == w && d.height == h && d.n_pixels == w * h, s"doc $id dims")
      val s = (0 until w * h).map(i => ((id * 31 + i) % 256).toInt).sum
      val expect = BigDecimal(3.0 * s / (3.0 * w * h))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(d.mean_pixel == expect, s"doc $id PNG mean ${d.mean_pixel} vs $expect")
    }
  }

  test("real codec: JPEG decodes exact dims and a near-exact mean (lossy)") {
    Seq(0L, 7L, 100L, 4242L).foreach { id =>
      val w = 8 + (id % 7).toInt
      val h = 8 + (id % 5).toInt
      val d = Multimodal.decodeImage(id, Multimodal.syntheticImage(id, w, h, "jpg"))
      assert(d.width == w && d.height == h, s"doc $id JPEG dims ${d.width}x${d.height}")
      val exp = (0 until w * h).map(i => ((id * 31 + i) % 256).toInt).sum.toDouble / (w * h)
      assert(math.abs(d.mean_pixel - exp) <= 3.0,
        s"doc $id JPEG mean ${d.mean_pixel} strays from $exp")
    }
  }

  test("multimodal_decode_jpeg: verdict grid all-true over a temp documents table") {
    val docsSeq = (0L until 30L).map(i => (i, "web", "en", s"doc $i"))
    val dir = java.nio.file.Files.createTempDirectory("jpegq").toString
    docsSeq.toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.relational.DataPipelineQueries.queries("multimodal_decode_jpeg")(spark, dir)
      .collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"jpeg verdict broken for doc ${r.getLong(0)}: $r")
    }
  }

  test("frame sampling: every 4th 16-byte frame, short payloads emit nothing") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val t144 = (0 until 9).map(i => ('a' + i).toChar.toString * 16).mkString // 9 frames
    val t48 = "x" * 48                                                       // 3 frames
    val docsSeq = Seq(
      (0L, "web", "en", t144, t144.length.toLong),
      (1L, "web", "en", t48, 48L),
      (2L, "web", "en", "short", 5L))                                        // 0 frames
    val dir = java.nio.file.Files.createTempDirectory("frames").toString
    docsSeq.toDF("doc_id", "source", "lang", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.relational.DataPipelineQueries.queries("multimodal_framesample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 0: frames 0, 4, 8 of 9; doc 1: frame 0 of 3; doc 2: absent
    assert(rows.toSeq == Seq(
      (0L, 9L, 0L, md5hex("a" * 16)),
      (0L, 9L, 4L, md5hex("e" * 16)),
      (0L, 9L, 8L, md5hex("i" * 16)),
      (1L, 3L, 0L, md5hex("x" * 16))), rows.toSeq.toString)
  }
}
