package graft.relational

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the r17 streamStateParts contract (r16 verdict #1 / advice #1-#2):
  * sizing goes through the Hadoop FileSystem API (recursive, any scheme —
  * NOT java.io.File, which reads 0 bytes for remote URIs and non-recursive
  * listings and pinned every stateful stream to the floor), and the
  * 8-partition floor applies INSIDE the session cap so the session's
  * cluster-sized value always bounds the result. */
class StreamStatePartsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Sparse file: length reads as `len` without writing `len` bytes. */
  private def sparse(f: java.io.File, len: Long): Unit = {
    f.getParentFile.mkdirs()
    val raf = new java.io.RandomAccessFile(f, "rw")
    try raf.setLength(len) finally raf.close()
  }

  private def withSessionParts[A](n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  test("nested (partitioned) layouts are summed recursively") {
    val root = java.nio.file.Files.createTempDirectory("ssp_nested_").toFile
    try {
      // two partition subdirs of 512 MiB each -> 1 GiB total -> 32 parts.
      // A non-recursive direct-file listing (the r16 bug) sums 0 -> floor.
      sparse(new java.io.File(root, "tbl/part=0/a.bin"), 512L << 20)
      sparse(new java.io.File(root, "tbl/part=1/b.bin"), 512L << 20)
      val parts = withSessionParts(64) {
        DataPipelineQueries.streamStateParts(spark, root.getAbsolutePath, "tbl")
      }
      assert(parts === 32)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(root)
    }
  }

  test("session value always bounds the result (floor inside the cap)") {
    val root = java.nio.file.Files.createTempDirectory("ssp_cap_").toFile
    try {
      sparse(new java.io.File(root, "tbl/a.bin"), 1L << 20) // 1 MiB -> floor 8
      val parts = withSessionParts(4) {
        DataPipelineQueries.streamStateParts(spark, root.getAbsolutePath, "tbl")
      }
      assert(parts === 4, "a session with < 8 shuffle partitions keeps its cap")
    } finally {
      Option(root.listFiles()).foreach(_.foreach { d =>
        Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete()
      })
      root.delete()
    }
  }

  test("non-file: URIs resolve through the Hadoop FileSystem, not java.io.File") {
    // Register a stub scheme backed by the local FS. java.io.File cannot
    // resolve "stubfs:/..." paths (the r16 code would read 0 bytes and
    // return the floor); the Hadoop path must sum the real sizes.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.stubfs.impl", classOf[StubLocalFs].getName)
    val root = java.nio.file.Files.createTempDirectory("ssp_stub_").toFile
    try {
      sparse(new java.io.File(root, "tbl/a.bin"), 2048L << 20) // 2 GiB -> 64
      val parts = withSessionParts(128) {
        DataPipelineQueries.streamStateParts(
          spark, "stubfs:" + root.getAbsolutePath, "tbl")
      }
      assert(parts === 64)
    } finally {
      Option(new java.io.File(root, "tbl").listFiles())
        .foreach(_.foreach(_.delete()))
      new java.io.File(root, "tbl").delete(); root.delete()
    }
  }

  test("missing source falls back to the floor (no throw)") {
    val parts = withSessionParts(64) {
      DataPipelineQueries.streamStateParts(spark, "/nonexistent_r17", "tbl")
    }
    assert(parts === 8)
  }
}

/** Local filesystem exposed under a non-file scheme for the spec above. */
class StubLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("stubfs:///")
}
