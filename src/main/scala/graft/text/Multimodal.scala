package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media travel as opaque `binary` cells with
  * typed metadata alongside; decode / feature-extract runs batch-wise in
  * `mapPartitions` (the JVM analog of `mapInPandas` — one partition = one
  * batch, codec state amortized across the batch).
  *
  * The actual codec is a STUB: no image/audio library ships in this
  * container, so [[decodeStub]] derives a deterministic fake
  * (width/height/per-byte stats) from the header bytes. The Spark-side
  * contract — binary column, metadata struct, partition-batched decode,
  * fixed output schema — is the real, tested part; swapping the stub for
  * javax.imageio / a JNI codec changes only the function body.
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
}
