package graft.relational

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (r17): phase timings inside scan_binaryfile. Not gate
  * surface. Usage: runMain graft.relational.R17BinScanProfile <sfDir> */
object R17BinScanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm
    t("warm docs scan")(Tables.tbl(s, sfDir, "documents").count())
    for (round <- 1 to 2) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_binprof")
      val dir = tmp.toString
      t(s"r$round write .bin files") {
        { val src0 = Tables.tbl(s, sfDir, "documents").select(col("doc_id"), col("text"))
          val src = if (src0.rdd.getNumPartitions < 32) src0.repartition(32, col("doc_id")) else src0
          src }
          .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            val sub = java.nio.file.Paths.get(dir,
              f"p=${org.apache.spark.TaskContext.getPartitionId()}%05d")
            java.nio.file.Files.createDirectories(sub)
            it.foreach { r =>
              java.nio.file.Files.write(
                sub.resolve(f"doc_${r.getLong(0)}%08d.bin"),
                r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
          }
      }
      val out = t(s"r$round binaryFile read+md5") {
        s.read.format("binaryFile").option("pathGlobFilter", "*.bin").option("recursiveFileLookup", "true").load(dir)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
            col("length"), md5(col("content")).as("content_md5"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true)
      }
      println("[bprof] rows " + out.count())
      t(s"r$round deleteRecursively")(DataPipelineQueries.deleteRecursively(tmp))
    }
    s.stop()
  }
}
