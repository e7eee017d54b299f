package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the session-scoped artifact memo behind `sharedAnnEdges`
  * (graph family's materialized k-NN edge table) and the pipeline
  * family's fitted-model reuse: one build per (session, corpus dir),
  * keyed by CANONICAL path so spelling variants of the same dir share
  * the artifact. (Eviction-on-session-stop cannot be exercised here —
  * the spec JVM owns one shared SparkContext — so it stays a code-path
  * documented in the scaladoc, guarded by `isStopped` only.) */
class SessionMemoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("builds once per (session, dir) and returns the memoized value") {
    val memo = new SessionMemo[String]
    var builds = 0
    val dir = java.nio.file.Files.createTempDirectory("memo_a_").toString
    val v1 = memo.getOrBuild(spark, dir) { builds += 1; s"artifact-$builds" }
    val v2 = memo.getOrBuild(spark, dir) { builds += 1; s"artifact-$builds" }
    assert(builds == 1)
    assert(v1 == "artifact-1" && v2 == "artifact-1")
    assert(memo.size == 1)
  }

  test("distinct corpus dirs build distinct artifacts") {
    val memo = new SessionMemo[String]
    val d1 = java.nio.file.Files.createTempDirectory("memo_b_").toString
    val d2 = java.nio.file.Files.createTempDirectory("memo_c_").toString
    assert(memo.getOrBuild(spark, d1)("one") == "one")
    assert(memo.getOrBuild(spark, d2)("two") == "two")
    assert(memo.size == 2)
  }

  test("canonical-path keying collapses spelling variants of one dir") {
    val memo = new SessionMemo[Int]
    val p = java.nio.file.Files.createTempDirectory("memo_d_")
    val plain = p.toString
    val dotted = p.resolve(".").toString // same dir, non-canonical spelling
    assert(memo.getOrBuild(spark, plain)(1) == 1)
    assert(memo.getOrBuild(spark, dotted)(2) == 1) // memo hit, no rebuild
    assert(memo.size == 1)
  }
}
