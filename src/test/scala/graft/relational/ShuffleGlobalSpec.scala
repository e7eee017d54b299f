package graft.relational

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The global shuffle must hand out exactly the md5 total order with
  * consecutive positions, and the numbering pass must NOT pay a second
  * shuffle: the only exchanges in the whole operator are the range
  * partition that establishes the order and the trailing presentation
  * sort. */
class ShuffleGlobalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("positions are the exact global md5 rank, consecutive from zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shufspec").toString
    val ids = (0L until 137L)
    ids.map(i => (i, "web", "en", s"doc $i"))
      .toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val q = DataPipelineQueries.queries("shuffle_global")(spark, dir)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = ids.map(i => (md5hex(s"epoch0:$i"), i)).sortBy(_._1)
      .zipWithIndex.map { case ((k, i), pos) => (k, i, pos.toLong) }
    assert(got.toSeq == want, s"order diverged:\n${got.take(5).toSeq}...")

    // the numbering side must be shuffle-free: no hash exchange anywhere
    // (the checkpoint already holds the range layout; stamping is
    // partition-local map work)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"numbering pass re-shuffles:\n$plan")
  }
}
