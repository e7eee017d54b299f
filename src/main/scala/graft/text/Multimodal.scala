package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media travel as opaque `binary` cells with
  * typed metadata alongside; decode / feature-extract runs batch-wise in
  * `mapPartitions` (the JVM analog of `mapInPandas` — one partition = one
  * batch, codec state amortized across the batch).
  *
  * Two codec tiers, same plumbing:
  *  - [[decodeStub]]: a deterministic fake (width/height/per-byte stats
  *    from the header bytes) standing in for ffmpeg-class audio/video
  *    codecs that genuinely aren't in this container;
  *  - [[decodeImage]]: a REAL still-image decoder via `javax.imageio`
  *    (BMP/PNG/JPEG/GIF ship with the JDK), exercised end-to-end by
  *    `multimodal_decode_real` over deterministic synthetic BMPs whose
  *    pixels a SQL oracle recomputes in closed form.
  * The Spark-side contract — binary column, metadata struct,
  * partition-batched decode, fixed output schema — is identical for both;
  * a JNI video codec would change only the function body.
  */
object Multimodal {

  final case class Decoded(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      mean_byte: Double, header_hex: String)

  /** Text → pretend-media: a binary payload column plus a metadata struct,
    * the ingest shape a real image/audio table would have. */
  def asBinaryTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr("cast(text as binary)").as("payload"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /** STUB codec: a real implementation would hand `bytes` to an image
    * decoder; this derives deterministic fake dimensions from the first
    * header bytes and real byte statistics from the payload, so tests can
    * pin exact values. */
  def decodeStub(docId: Long, bytes: Array[Byte]): Decoded = {
    val n = bytes.length
    val h0 = if (n > 0) bytes(0) & 0xff else 0
    val h1 = if (n > 1) bytes(1) & 0xff else 0
    val width = 16 + (h0 % 16) * 4
    val height = 16 + (h1 % 16) * 4
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    val hex = bytes.take(8).map(b => f"${b & 0xff}%02X").mkString
    Decoded(docId, n, width, height,
      BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, hex)
  }

  /** Partition-batched decode over the binary table — the `mapInPandas`
    * analog. The iterator shape keeps per-batch codec setup O(1) per
    * partition, not per row. */
  def decodeAll(spark: SparkSession, binaryTable: DataFrame): Dataset[Decoded] = {
    import spark.implicits._
    binaryTable
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (stubbed)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  // ------------------------------------------------------- REAL codec (JDK)
  // javax.imageio ships with every JDK (BMP/PNG/JPEG/GIF readers), so the
  // "no media libs in this container" constraint only rules out ffmpeg-class
  // codecs — still-image decode below is the real thing, not a stub.

  final case class DecodedImage(
      doc_id: Long, width: Int, height: Int, n_pixels: Int, mean_pixel: Double)

  /** Deterministic 24-bit grayscale BMP: pixel (x, y) has all three
    * channels equal to `(docId * 31 + y * width + x) % 256` — a closed
    * form a SQL oracle can recompute without touching the codec. Rows are
    * written bottom-up with 4-byte padding per the BMP spec. */
  def syntheticBmp(docId: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowSize = (width * 3 + 3) / 4 * 4
    val fileSize = 54 + rowSize * height
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24)                 // planes, bpp
      .putInt(0).putInt(rowSize * height)       // no compression
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette unused
    var y = height - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = ((docId * 31 + y.toLong * width + x) % 256).toInt
        buf.put(v.toByte).put(v.toByte).put(v.toByte) // B, G, R
        x += 1
      }
      var pad = width * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Deterministic grayscale image via the JDK's OWN encoders: the same
    * closed-form pixels as [[syntheticBmp]] (`(docId·31 + y·w + x) % 256`
    * in every channel), written through `ImageIO.write` in `format`
    * ("png", "jpg", ...). PNG is lossless — decode returns the exact
    * closed form, so the BMP oracle applies verbatim; JPEG is lossy —
    * callers assert dims exactly and the mean within a tolerance. */
  def syntheticImage(docId: Long, width: Int, height: Int, format: String): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = ((docId * 31 + y.toLong * width + x) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format $format")
    bos.toByteArray()
  }

  /** Grayscale PNG from an explicit pixel grid (`pixels(y)(x)` ∈ 0..255,
    * every channel set to the gray value) through the JDK's own encoder —
    * the generator behind the perceptual-hash query, whose pixel field is
    * md5-derived so the gradient hash is non-degenerate (the
    * [[syntheticBmp]] ramp makes every dHash bit 1). PNG is lossless, so
    * the decoded raster equals the grid exactly and a closed-form oracle
    * applies. */
  def pngFromPixels(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixels(y)(x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer")
    bos.toByteArray()
  }

  /** REAL decode: `javax.imageio.ImageIO.read` over the payload bytes.
    * `mean_pixel` averages ALL channel samples (R+G+B over 3·n pixels), so
    * on a grayscale image it equals the mean gray value. Fails loudly on
    * an undecodable payload — silently skipping corrupt media is how
    * training sets rot. */
  def decodeImage(docId: Long, bytes: Array[Byte]): DecodedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $docId: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val mean = sum.toDouble / (3.0 * w * h)
    DecodedImage(docId, w, h, w * h,
      BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Partition-batched REAL decode — same plumbing as [[decodeAll]], with
    * the in-memory codec configured once per partition (`setUseCache
    * (false)` keeps ImageIO off executor local disk: decode stays a pure
    * CPU pass over the shuffled/scanned bytes, no temp-file I/O). */
  def decodeAllReal(spark: SparkSession, binaryTable: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    binaryTable
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        it.map { case (id, bytes) => decodeImage(id, bytes) }
      }
  }

  /** Nearest-neighbor 2× downsample through the REAL decoder: dims in/out
    * plus the mean gray of the SAMPLED grid (pixels at even (x, y) — the
    * canonical nearest-neighbor phase). `mean_resized` is returned
    * unrounded; callers round at presentation. */
  case class ResizedImage(doc_id: Long, w_in: Long, h_in: Long,
                          w_out: Long, h_out: Long, mean_resized: Double)

  def resizeNearest(docId: Long, bytes: Array[Byte]): ResizedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $docId: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val (wo, ho) = ((w + 1) / 2, (h + 1) / 2)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sum += img.getRGB(x, y) & 0xff // gray: all channels equal
        x += 2
      }
      y += 2
    }
    ResizedImage(docId, w, h, wo, ho, sum.toDouble / (wo.toLong * ho))
  }

  /** Per-pixel gray values for histogramming — tiny fixture images, but
    * the shape is the real one: decode emits pixel ROWS and the histogram
    * is a downstream combinable aggregate (never a driver pass). */
  def grayPixels(docId: Long, bytes: Array[Byte]): Iterator[(Long, Int)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $docId: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    (0 until h).iterator.flatMap(y => (0 until w).iterator.map(x =>
      (docId, img.getRGB(x, y) & 0xff)))
  }
}
