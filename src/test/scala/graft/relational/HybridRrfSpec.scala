package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RRF fusion contract (r12 verdict ask #6): integer contributions
  * 10⁹ div (60 + rank) per present leg, absent legs contribute 0, fused
  * order (score DESC, doc_id). The acceptance case: a doc at rank 2 in
  * BOTH legs must beat a doc at rank 1 in one leg and absent from the
  * other — 2·(10⁹ div 62) = 32,258,064 > 10⁹ div 61 = 16,393,442. */
class HybridRrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rank-2-in-both beats rank-1-in-one-absent-in-other") {
    // query 7: lex ranks docs (50=1, 60=2); vec ranks docs (70=1, 60=2)
    val lex = Seq((7L, 50L, 1L), (7L, 60L, 2L)).toDF("qid", "doc_id", "rank")
    val vec = Seq((7L, 70L, 1L), (7L, 60L, 2L)).toDF("qid", "doc_id", "rank")
    val out = SearchQueries.rrfFuse(lex, vec)
      .orderBy(col("fused_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // doc 60: 2 × (1e9 div 62); docs 50/70: 1e9 div 61 each, tie → smaller id
    assert(out(0) == ((7L, 60L, 2L * (1000000000L / 62L), 1L)), out.mkString(","))
    assert(out(1) == ((7L, 50L, 1000000000L / 61L, 2L)), out.mkString(","))
    assert(out(2) == ((7L, 70L, 1000000000L / 61L, 3L)), out.mkString(","))
    // leg ranks surface (and NULL where absent)
    val rows = SearchQueries.rrfFuse(lex, vec).orderBy(col("fused_rank")).collect()
    assert(rows(1).isNullAt(rows(1).fieldIndex("vec_rank")), "doc 50 has no vec rank")
    assert(rows(2).isNullAt(rows(2).fieldIndex("lex_rank")), "doc 70 has no lex rank")
  }

  test("weighted fusion preserves score margins where RRF flattens them") {
    // lex: doc 50 towers over doc 60 (9.0 vs 1.0 in micros → norms 1e6 vs
    // 0); doc 40 sits between (5.0 → norm 500000). vec: doc 60 barely
    // ahead of 50 (0.31 vs 0.30, 40 at 0.29). RRF sees only ranks (60
    // would tie-war); weighted keeps lex's margin: 50 wins outright.
    val lex = Seq((3L, 50L, 9000000L), (3L, 40L, 5000000L), (3L, 60L, 1000000L))
      .toDF("qid", "doc_id", "score_micros")
    val vec = Seq((3L, 60L, 310000L), (3L, 50L, 300000L), (3L, 40L, 290000L))
      .toDF("qid", "doc_id", "score_micros")
    val out = SearchQueries.weightedFuse(lex, vec).orderBy(col("fused_rank"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // norms — lex: 50→1e6, 40→5e5, 60→0; vec: 60→1e6, 50→5e5, 40→0
    // fused: 50 = (6e6+2e6)/10 = 800000; 60 = (0+4e6)/10 = 400000;
    //        40 = (3e6+0)/10 = 300000
    assert(out.toSeq == Seq((50L, 800000L), (60L, 400000L), (40L, 300000L)),
      out.mkString(","))
  }

  test("weighted fusion: constant leg normalizes to 1e6; absent leg contributes 0") {
    val lex = Seq((1L, 10L, 2500000L), (1L, 20L, 2500000L))
      .toDF("qid", "doc_id", "score_micros")
    val vec = Seq((1L, 30L, 900000L)).toDF("qid", "doc_id", "score_micros")
    val rows = SearchQueries.weightedFuse(lex, vec).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // constant lex leg → both docs norm 1e6 → fused 600000; vec-only doc:
    // single-row leg is constant too → norm 1e6 → fused 400000
    assert(rows == Map(10L -> 600000L, 20L -> 600000L, 30L -> 400000L), rows.toString)
  }

  test("fusion is per-query and capped at HybridTopK") {
    // 2 queries × 15 lex-only docs each → each query keeps its own top 10
    val lex = (for (q <- 1L to 2L; r <- 1L to 15L) yield (q, 1000 * q + r, r))
      .toDF("qid", "doc_id", "rank")
    val vec = Seq.empty[(Long, Long, Long)].toDF("qid", "doc_id", "rank")
    val out = SearchQueries.rrfFuse(lex, vec)
    assert(out.count() == 20L)
    assert(out.groupBy(col("qid")).count().collect()
      .forall(_.getLong(1) == 10L))
    // within a query, fused order follows lex rank (single leg, no ties)
    val q1 = out.filter(col("qid") === 1L).orderBy(col("fused_rank"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(q1 == (1L to 10L).map(1000L + _), q1)
  }
}
