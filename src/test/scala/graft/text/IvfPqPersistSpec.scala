package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF+PQ index (r14 verdict ask #3): save → load round-trips
  * the index bit-exactly (centers, codebooks, coded tier) and the
  * reloaded index serves bit-identical results. */
class IvfPqPersistSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rmTree(p: java.nio.file.Path): Unit = {
    import java.nio.file._
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
  }

  private def embeddings = spark.read
    .parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("save -> load round-trips centers, codebooks and coded tier bit-exactly") {
    val e = embeddings
    val idx = Similarity.ivfPqIndex(e, k = 64)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec_")
    try {
      Similarity.saveIvfPqIndex(idx, tmp.toString)
      val r = Similarity.loadIvfPqIndex(spark, tmp.toString)
      assert(r.m === idx.m && r.k === idx.k && r.subDim === idx.subDim)
      assert(r.centers.length === idx.centers.length)
      idx.centers.indices.foreach { i =>
        idx.centers(i).indices.foreach { j =>
          assert(java.lang.Double.doubleToRawLongBits(idx.centers(i)(j)) ===
            java.lang.Double.doubleToRawLongBits(r.centers(i)(j)),
            s"center ($i,$j) bits")
        }
      }
      assert(r.codebooks.length === idx.codebooks.length)
      idx.codebooks.indices.foreach { s =>
        assert(r.codebooks(s).length === idx.codebooks(s).length)
        idx.codebooks(s).indices.foreach { c =>
          idx.codebooks(s)(c).indices.foreach { j =>
            assert(java.lang.Double.doubleToRawLongBits(idx.codebooks(s)(c)(j)) ===
              java.lang.Double.doubleToRawLongBits(r.codebooks(s)(c)(j)),
              s"codebook ($s,$c,$j) bits")
          }
        }
      }
      assert(idx.coded.except(r.coded).count() === 0L)
      assert(r.coded.except(idx.coded).count() === 0L)
    } finally rmTree(tmp)
  }

  test("serving from the reloaded index is bit-identical to the fitted one") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val idx = Similarity.ivfPqIndex(e, k = 64)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec2_")
    try {
      Similarity.saveIvfPqIndex(idx, tmp.toString)
      val r = Similarity.loadIvfPqIndex(spark, tmp.toString)
      val a = Similarity.ivfpqTopK(e, q, k = 5, nProbe = 6, rerank = 20,
        index = Some(idx))
      val b = Similarity.ivfpqTopK(e, q, k = 5, nProbe = 6, rerank = 20,
        index = Some(r))
      assert(a.except(b).count() === 0L)
      assert(b.except(a).count() === 0L)
      assert(b.filter(col("neighbor").isNotNull).count() === 50L,
        "5 neighbors per query from the reloaded index")
    } finally rmTree(tmp)
  }

  test("loader fails loudly on a subspace-incomplete codebooks table") {
    val e = embeddings
    val idx = Similarity.ivfPqIndex(e, k = 64)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_bad_")
    try {
      Similarity.saveIvfPqIndex(idx, tmp.toString)
      // drop one subspace from the codebooks table
      val crippled = spark.read.parquet(s"$tmp/codebooks").filter(col("sub") =!= 0)
      crippled.write.mode("overwrite").parquet(s"$tmp/codebooks2")
      rmTree(java.nio.file.Paths.get(s"$tmp/codebooks"))
      java.nio.file.Files.move(java.nio.file.Paths.get(s"$tmp/codebooks2"),
        java.nio.file.Paths.get(s"$tmp/codebooks"))
      val ex = intercept[IllegalArgumentException] {
        Similarity.loadIvfPqIndex(spark, tmp.toString)
      }
      assert(ex.getMessage.contains("covers subspaces"))
    } finally rmTree(tmp)
  }
}
