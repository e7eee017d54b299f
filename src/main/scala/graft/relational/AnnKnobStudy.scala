package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement harness for the ANN edge-build geometry (r10
  * verdict ask #4): the 10× fixture showed adaptive code width 5→9
  * driving the edge build's 12.7× growth, so this sweeps
  * bits ∈ {fixed 6, adaptive, adaptive capped at 8} × bucket cap ∈
  * {256, 512, 1024}, measuring build wall, candidate volume (edge
  * count), and mean recall@k of the built graph against the exact
  * sampled leg — the data the production default is picked from
  * (PLANS.md records the table; the GATE geometry stays whatever the
  * oracle CASE-chain pins).
  *
  * Usage: `runMain graft.relational.AnnKnobStudy <sfDir> [<sfDir2> ...]`
  * — one JSON line per (dir, config) to stdout. Never invoked by the
  * driver; classpath-only cost. */
object AnnKnobStudy {

  /** Exact-leg recall via the family's ONE brute-force baseline
    * ([[graft.text.Similarity.bruteForceTopK]] — same tie order, same
    * rounding; re-implementing it here would let the two baseline
    * definitions drift and silently change published knob-study numbers). */
  private def recallOf(emb: DataFrame, edges: DataFrame, k: Int, sample: Int): Double = {
    import graft.text.Similarity
    val asEmb = emb.select(col("vec_id"), col("v").as("embedding"))
    val exact = Similarity
      .bruteForceTopK(asEmb, asEmb.filter(col("vec_id") < sample), k)
      .select(col("qid").as("src"), col("neighbor").as("dst"))
    val row = exact
      .join(edges.filter(col("src") < sample).withColumn("hit", lit(1)),
        Seq("src", "dst"), "left")
      .agg(avg(coalesce(col("hit"), lit(0)).cast("double"))).head()
    if (row.isNullAt(0)) -1.0 else row.getDouble(0)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnKnobStudy <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    args.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .localCheckpoint(true)
      val n = emb.count()
      val adaptive = AnalyticsQueries.graphBits(n)
      val modes = Seq(
        ("fixed6", 6),
        ("adaptive", -1),
        ("adaptive_cap8", math.min(adaptive, 8)))
      for ((mode, bitsArg) <- modes; cap <- Seq(256L, 512L, 1024L)) {
        // warm nothing between configs beyond the checkpointed corpus —
        // each build pays its own bucketing + join + re-rank. Cleanup is
        // scoped to RDDs THIS config created: a blanket unpersist would
        // destroy the corpus localCheckpoint's blocks mid-study.
        val keep = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        val edges = AnalyticsQueries
          .annKnnEdges(emb, checkpoint = true, bitsOverride = bitsArg, cap = cap)
          .localCheckpoint(true)
        val nEdges = edges.count()
        val buildS = (System.nanoTime() - t0) / 1e9
        val rec = recallOf(emb, edges, k = AnalyticsQueries.PrK, sample = 50)
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => keep.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
        val bitsUsed = if (bitsArg > 0) bitsArg else adaptive
        println(s"""{"dir":"$dir","n_vec":$n,"mode":"$mode","bits":$bitsUsed,""" +
          s""""cap":$cap,"build_s":${fmt(buildS)},"edges":$nEdges,""" +
          s""""mean_recall":${fmt(rec)}}""")
      }
    }
    spark.stop()
  }
}
