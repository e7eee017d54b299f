package graft
import org.apache.spark.sql.SparkSession
object Bench {
  // /proc/loadavg snapshot — makes a run on a loaded box SELF-IDENTIFYING:
  // round 5's driver artifact was 10-55x a quiet-box re-run of the same
  // commit and nothing in the JSON revealed it. "unavailable" off-Linux.
  private def loadavg(): String =
    try scala.util.Using.resource(scala.io.Source.fromFile("/proc/loadavg"))(
      _.mkString.trim)
    catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadBefore = loadavg()
    val startedAtMs = System.currentTimeMillis()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: absorb JVM/codegen/netlib/MLlib init so the FIRST
    // timed query (alphabetically) and the first MLlib user aren't inflated
    // ~5-10 s — keeps round-over-round deltas attributable to code changes
    try SparkEntry.queries.get("pipeline_fit_predict").foreach(_(spark, sfDir).count())
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed: ${e.getClass.getSimpleName}: ${e.getMessage}") }
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    // sorted: deterministic execution order makes per-round timings comparable
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a crashing query must read as a FAILURE, not a fast time
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors += s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}"
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map(e => "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val env = s""""load_before":"$loadBefore","load_after":"${loadavg()}",""" +
      s""""started_at_ms":$startedAtMs,"finished_at_ms":${System.currentTimeMillis()}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,$env,"sf":"$sfDir"}""")
    spark.stop()
  }
}
