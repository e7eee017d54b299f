package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The governance contracts of the encrypted sink that the value hash
  * can't see: the bytes on disk really are encrypted-footer parquet
  * (PARE magic, vs PAR1 plaintext), and a reader WITHOUT the keyring
  * cannot read them at all. */
class SinkEncryptedSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def lastMagic(dir: String): String = {
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      raf.seek(f.length() - 4)
      val b = new Array[Byte](4); raf.readFully(b); new String(b, "US-ASCII")
    } finally raf.close()
  }

  test("encrypted writes end in PARE, plain writes in PAR1, and keyless reads fail") {
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    val tmp = java.nio.file.Files.createTempDirectory("graft_enc_spec")
    val plainDir = tmp.resolve("plain").toString
    val encDir = tmp.resolve("enc").toString
    val df = Seq((1L, "alpha", "en"), (2L, "beta", "de")).toDF("id", "text", "lang")
    df.write.parquet(plainDir)
    assert(lastMagic(plainDir) === "PAR1")
    val keys = Seq("parquet.crypto.factory.class",
      "parquet.encryption.kms.client.class", "parquet.encryption.key.list")
    val prev = keys.map(k => k -> Option(hc.get(k)))
    try {
      hc.set("parquet.crypto.factory.class",
        "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory")
      hc.set("parquet.encryption.kms.client.class", "graft.sources.ConfKeyringKms")
      hc.set("parquet.encryption.key.list",
        "kf:AAECAwQFBgcICQoLDA0ODw==, kc:EBESExQVFhcYGRobHB0eHw==")
      df.write.option("parquet.encryption.footer.key", "kf")
        .option("parquet.encryption.column.keys", "kc:text").parquet(encDir)
      assert(lastMagic(encDir) === "PARE", "footer must be encrypted on disk")
      // keyed read round-trips
      assert(spark.read.parquet(encDir).orderBy("id").collect().map(_.getString(1)).toSeq
        === Seq("alpha", "beta"))
      // keyless read (no factory, no keyring) must FAIL, not return garbage
      keys.foreach(hc.unset)
      val err = intercept[Throwable] { spark.read.parquet(encDir).collect() }
      assert(err.toString.toLowerCase.contains("encrypt")
        || Option(err.getCause).exists(_.toString.toLowerCase.contains("encrypt")),
        s"unexpected failure mode: $err")
    } finally prev.foreach {
      case (k, Some(v)) => hc.set(k, v)
      case (k, None) => hc.unset(k)
    }
  }

  test("observe_metrics: in-flight counters equal an independent recompute") {
    val rows = QualityQueries.queries("observe_metrics")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.tbl(spark, sf, "documents").collect()
    val nDocs = docs.length.toLong
    val totalChars = docs.map(_.getAs[Long]("n_chars")).sum
    rows.foreach { r =>
      assert(r.getLong(2) === nDocs)
      assert(r.getLong(3) === totalChars)
      assert(r.getLong(4) === docs.count(d => d.getAs[String]("text").isEmpty).toLong)
      assert(r.getLong(5) === docs.count(_.getAs[String]("lang") == null).toLong)
    }
    assert(rows.map(_.getLong(1)).sum === nDocs, "per-lang counts partition the corpus")
  }

  test("sink_parquet_encrypted: verdict true and per-lang aggregate equals the source") {
    val rows = QualityQueries.queries("sink_parquet_encrypted")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3)))
    val src = Tables.tbl(spark, sf, "documents").groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) === src(r.getString(0)))
    }
  }
}
