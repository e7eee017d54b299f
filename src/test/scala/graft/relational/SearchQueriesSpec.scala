package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval wave (SearchQueries). Oracle parity runs at the gate; these
  * specs pin the geometry the value hash can't see: chunk coverage and
  * overlap, inverted-index completeness against a driver recompute, BM25's
  * full formula against an independent scorer, and the plan shapes
  * (bounded top-k, broadcast lexicon).
  */
class SearchQueriesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SearchQueries.queries(name)(spark, sf)

  private def toksOf: Map[Long, Array[String]] =
    Tables.tbl(spark, sf, "documents")
      .select(col("doc_id"), graft.text.TextOps.tokens("text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap

  // ------------------------------------------------------------- chunking
  test("text_chunk: windows of 50, stride 40, full coverage, exact reconstruction") {
    val chunks = q("text_chunk").collect()
    assert(chunks.nonEmpty)
    val toks = toksOf
    chunks.groupBy(_.getLong(0)).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === sorted.indices.map(_.toLong),
        s"doc $doc: chunk ids are 0..k-1")
      val t = toks(doc)
      val expected = if (t.length <= 50) 1 else math.ceil((t.length - 50) / 40.0).toInt + 1
      assert(sorted.length === expected, s"doc $doc: closed-form chunk count")
      sorted.foreach { c =>
        val start = (c.getLong(1) * 40).toInt
        val piece = t.slice(start, start + 50)
        assert(c.getLong(2) === piece.length.toLong, s"doc $doc chunk ${c.getLong(1)}: length")
        assert(c.getString(3) === piece.mkString(" "), s"doc $doc chunk ${c.getLong(1)}: text")
      }
      // coverage: the last chunk must reach the final token
      val last = sorted.last
      assert(last.getLong(1) * 40 + last.getLong(2) >= t.length,
        s"doc $doc: tail token covered")
    }
  }

  test("text_chunk plan: no shuffle before the presentation sort") {
    val plan = q("text_chunk").queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"chunking must be map-only up to the final sort:\n$plan")
  }

  // ------------------------------------------------------- inverted index
  test("text_inverted_index: lexicon is top-100 by (df desc, token); postings complete") {
    val rows = q("text_inverted_index").collect()
    val toks = toksOf
    // recompute df for the full vocabulary
    val dfAll = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val lexicon = dfAll.toSeq.sortBy { case (t, df) => (-df, t) }.take(100).toMap
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === lexicon.keySet, "kept terms are exactly the top-100 lexicon")
    got.foreach { case (t, df) => assert(df === lexicon(t).toLong, s"df of $t") }
    // postings of one term match a full recompute (tf per containing doc)
    val term = lexicon.keys.min
    val expected = toks.flatMap { case (doc, ts) =>
      val tf = ts.count(_ == term); if (tf > 0) Some(doc -> tf.toLong) else None
    }
    val postings = rows.filter(_.getString(0) == term).map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(postings === expected, s"postings of '$term' are complete and exact")
  }

  test("text_inverted_index plan: lexicon joined back by broadcast, cap via TakeOrdered") {
    val plan = q("text_inverted_index").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"lexicon must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"cap must be a bounded top-k:\n$plan")
  }

  // --------------------------------------------------------------- BM25
  test("text_search_bm25 matches an independent driver-side scorer") {
    val rows = q("text_search_bm25").collect()
    assert(rows.length === 20)
    val toks = toksOf
    val query = Seq("spark", "window", "merge")
    val n = toks.size.toDouble
    val avgdl = BigDecimal(toks.values.map(_.length).sum / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dft = query.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    val scored = toks.flatMap { case (doc, ts) =>
      val dl = ts.length.toDouble
      val ws = query.flatMap { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val idf = r6(math.log((n - dft(t) + 0.5) / (dft(t) + 0.5) + 1.0))
          Some(r6(idf * tf * 2.2 / (tf + (dl / avgdl * 0.75 + 0.25) * 1.2)))
        }
      }
      if (ws.isEmpty) None
      // per-term 6-dp weights lifted to BIGINT micros, then an EXACT
      // integer sum — the order-independent score the engine now emits
      else Some((doc, ws.map(w => math.round(w * 1e6)).sum, ws.length))
    }.toSeq
    val expected = scored.sortBy { case (doc, score, _) => (-score, doc) }.take(20)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)).toSeq
    assert(got === expected, "top-20 ranking, scores, and term counts all match")
  }

  test("integer micro scores are order-invariant where 4-dp double sums flip") {
    // Planted 6-dp term weights whose exact decimal sum (1.670350) sits ON
    // a 4-dp half boundary: two accumulation orders of the DOUBLE sum round
    // to different 4-dp values — the r13 `round(sum(w_r), 4)` score
    // definition, and the mechanism behind the search_hybrid_weighted
    // driver-gate hash-fail (partition order flipped the rounded score).
    val terms = Seq(0.682555, 0.050632, 0.075955, 0.861169, 0.000039)
    def r4(xs: Seq[Double]): BigDecimal =
      BigDecimal(xs.foldLeft(0.0)(_ + _))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val orderB = Seq(0.682555, 0.050632, 0.075955, 0.000039, 0.861169)
    assert(r4(terms) != r4(orderB),
      "witness: double summation IS order-dependent at the 4-dp boundary")
    // the shipped path: lift each 6-dp term to BIGINT micros, sum integers
    def micros(xs: Seq[Double]): Long = xs.map(w => math.round(w * 1e6)).sum
    assert(terms.permutations.map(micros).toSet.size === 1,
      "integer micro sum is identical under EVERY accumulation order")
    assert(micros(terms) === 1670350L)
  }

  test("text_search_bm25 plan: bounded top-k, broadcast stats and df") {
    val plan = q("text_search_bm25").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"rank must be bounded top-k:\n$plan")
    assert("BroadcastNestedLoopJoin|BroadcastHashJoin".r.findAllIn(plan).nonEmpty,
      s"1-row stats and 3-row df must broadcast:\n$plan")
  }
}
