package graft.relational

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the minhash_sigs memo width question (r14
  * verdict ask #1): the memo persists the shingle arrays (~5× the text
  * bytes) beside the signatures, and the open lever is a narrow
  * (set_key, sig, bb) memo with output-sized shingle re-derivation for
  * agreement SURVIVORS only. Pulling it blind would be guesswork; this
  * harness attributes the serve cost:
  *
  *   t_build            one-time memo build (shingle+sign+write)
  *   t_serve_minhash    dedup_minhash full serve from the memo
  *   t_scan_full        one full-width scan of sigs (sh + sig + bb read)
  *   t_scan_narrow      the same scan column-pruned to (sig, bb)
  *   t_sh_io = full − narrow   the per-pass shingle-column IO the narrow
  *                      memo would save
  *   t_reshingle_all    re-deriving shingles for EVERY distinct text (a
  *                      strict upper bound on the survivor re-derivation
  *                      the narrow memo would pay per family query)
  *   bytes_full/narrow  on-disk memo width (narrow = sh dropped)
  *
  * Decision rule recorded in PLANS: pull the lever only if t_sh_io is a
  * material share of t_serve AND t_reshingle_all (the upper bound on the
  * added cost) is clearly below the saving.
  *
  * Usage: `runMain graft.relational.MinhashProfile <sfDir> [...]` — one
  * JSON line per dir. Never invoked by the driver; classpath-only cost. */
object MinhashProfile {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MinhashProfile <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NOTE: spark.driver.memory set here would be a no-op — the JVM heap
      // is fixed at launch (build.sbt's fork flags; raise with
      // SPARK_DRIVER_MEM=24g per the verify skill for 100x fixtures)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    args.foreach { dir =>
      // one-time build (the family ledger also records it)
      val (_, tBuild) = timed {
        DataPipelineQueries.minhashSigsTables(spark, dir)._2.count()
      }
      val (sigsRowCount, _) =
        timed(DataPipelineQueries.minhashSigsTables(spark, dir)._2.count())
      // serve from the warm memo
      val (_, tServe) = timed {
        DataPipelineQueries.queries("dedup_minhash")(spark, dir).count()
      }
      val sigsT = DataPipelineQueries.minhashSigsTables(spark, dir)._2
      // full-width scan: force-read sh + sig + bb
      val (_, tScanFull) = timed {
        sigsT.agg(sum(size(col("sh"))), sum(size(col("sig"))),
          sum(size(col("bb")))).head()
      }
      // narrow scan: column-pruned to (sig, bb) — parquet never reads sh
      val (_, tScanNarrow) = timed {
        sigsT.agg(sum(size(col("sig"))), sum(size(col("bb")))).head()
      }
      // upper bound on survivor re-derivation: shingle EVERY distinct text
      val (_, tReshingleAll) = timed {
        docs(spark, dir)
          .select(graft.text.TextOps.normalized("text").as("norm"))
          .groupBy(col("norm")).agg(count(lit(1)))
          .select(graft.text.TextOps.charShingles("norm", 5).as("sh"))
          .agg(sum(size(col("sh")))).head()
      }
      // on-disk width: rewrite the sigs table narrow and compare
      val tmp = java.nio.file.Files.createTempDirectory("graft_mh_profile_")
      try {
        sigsT.write.mode("overwrite").parquet(s"$tmp/full")
        sigsT.select(col("set_key"), col("sig"), col("bb"))
          .write.mode("overwrite").parquet(s"$tmp/narrow")
        val bFull = dirBytes(java.nio.file.Paths.get(s"$tmp/full"))
        val bNarrow = dirBytes(java.nio.file.Paths.get(s"$tmp/narrow"))
        println(
          s"""{"dir":"$dir","sigs_rows":$sigsRowCount,""" +
          s""""t_build":${fmt(tBuild)},"t_serve_minhash":${fmt(tServe)},""" +
          s""""t_scan_full":${fmt(tScanFull)},"t_scan_narrow":${fmt(tScanNarrow)},""" +
          s""""t_sh_io":${fmt(tScanFull - tScanNarrow)},""" +
          s""""t_reshingle_all":${fmt(tReshingleAll)},""" +
          s""""bytes_full":$bFull,"bytes_narrow":$bNarrow,""" +
          s""""narrow_share":${fmt(bNarrow.toDouble / math.max(1L, bFull))}}""")
      } finally DataPipelineQueries.deleteRecursively(tmp)
    }
    spark.stop()
  }

  private def docs(s: SparkSession, d: String) = Tables.tbl(s, d, "documents")
}
