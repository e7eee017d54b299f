package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** The stream-side argmax kernel's NULL-input contract (r15 advice): a
  * NULL corpus embedding must replicate the batch crossJoin's pin —
  * cosine −1.0 (coalesce guard on every pair) with the struct-max landing
  * on the SMALLEST benchmark id — in BOTH the interpreted and codegen
  * paths, not return NULL. The happy path is exhaustively covered by the
  * stream_embed_decontaminate gate (shared oracle with the batch pass);
  * this spec pins the edge the fixtures never exercise. */
class BestPartnerConstSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private val bids = Array(30L, 10L, 20L)
  private val bvecs = Array(
    Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0))

  private def best(c: String) = ColumnBridge.column(
    BestPartnerConst(ColumnBridge.expression(col(c)), bids, bvecs))

  private def run(codegenMode: String): Seq[org.apache.spark.sql.Row] = {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", codegenMode)
    try {
      Seq(
        (1L, Some(Seq(Some(0.0), Some(2.0), Some(0.0)))), // best = bid 10
        (2L, None),                                       // NULL embedding
        (3L, Some(Seq(Some(1.0), None, Some(0.0))))       // NULL element
      ).toDF("id", "emb")
        .select(col("id"), best("emb").as("best"))
        .select(col("id"), col("best.bid"), col("best.cosine"))
        .orderBy(col("id")).collect().toSeq
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("NULL input pins to (min bid, -1.0) like the batch coalesce — both paths") {
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val rows = run(mode)
      assert(rows(0).getLong(1) === 10L && rows(0).getDouble(2) === 1.0,
        s"$mode happy path")
      // NULL array: batch pins every pair to -1, smallest bid wins
      assert(!rows(1).isNullAt(1), s"$mode: NULL input must not yield NULL")
      assert(rows(1).getLong(1) === 10L && rows(1).getDouble(2) === -1.0,
        s"$mode NULL-input pin")
      // NULL element: same pin via the hasNull guard (unchanged semantics)
      assert(rows(2).getLong(1) === 10L && rows(2).getDouble(2) === -1.0,
        s"$mode NULL-element pin")
    }
  }

  test("batch-plan parity for the NULL row: crossJoin coalesce reaches the same verdict") {
    val bench = bids.zip(bvecs).toSeq.map { case (b, v) => (b, v.toSeq) }
      .toDF("bid", "be")
    val corp = Seq((2L, Option.empty[Seq[Double]])).toDF("vec_id", "emb")
    val got = corp.crossJoin(broadcast(bench))
      .withColumn("cosine", round(graft.text.Similarity.cosine("be", "emb"), 6))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cosine"), (-col("bid")).as("nbid"))).as("best"))
      .select((-col("best.nbid")).as("bid"), col("best.cosine")).head
    assert(got.getLong(0) === 10L && got.getDouble(1) === -1.0)
  }
}
