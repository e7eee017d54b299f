package graft.relational

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the two r11 census operators on synthesized
  * fixtures with KNOWN answers: the ExactSubstr interval-union
  * arithmetic (overlapping and disjoint duplicated spans) and the
  * embedding-drift flag on an injected per-dimension shift. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ssdedup").toString
    rows.map { case (id, t) => (id, "web", "en", t) }
      .toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[Long, (Long, Long, Long, Long, Long)] =
    DataPipelineQueries.queries("text_substring_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap

  test("disjoint duplicated windows: union equals count x W; clean docs stay zero") {
    // doc 0 and doc 1 share an exact 40-char block; doc 2 is clean and
    // short. Pads must be non-self-similar (a constant-char pad makes
    // every all-pad window identical to its neighbors — 21 spurious
    // in-doc duplicates in the first cut of this spec)
    val block = "a" * 39 + "b" // exactly 40 chars, unique pattern
    // explicit distinct FIRST char: equal pad heads would extend the
    // shared block by one more duplicated window
    val pad1 = "q" + new scala.util.Random(11L).alphanumeric.take(59).mkString.toLowerCase
    val pad2 = "z" + new scala.util.Random(22L).alphanumeric.take(59).mkString.toLowerCase
    val dir = writeDocs(Seq(
      (0L, block + pad1), (1L, block + pad2), (2L, "short and clean")))
    val m = run(dir)
    // only ONE window (start 1) of each doc matches across docs: the
    // 40-char block itself; every shifted window mixes in distinct pads
    assert(m(0L) == (100L, 61L, 1L, 40L, 60L), s"doc0: ${m(0L)}")
    assert(m(1L) == (100L, 61L, 1L, 40L, 60L), s"doc1: ${m(1L)}")
    assert(m(2L) == (15L, 0L, 0L, 0L, 15L), s"doc2: ${m(2L)}")
  }

  test("overlapping duplicated windows union, not sum") {
    // two identical docs: EVERY window is duplicated; union = whole doc,
    // not n_windows x W
    val t = ("the quick brown fox jumps over the lazy dog " * 3).trim // 133 chars
    val dir = writeDocs(Seq((0L, t), (1L, t)))
    val m = run(dir)
    val n = t.length.toLong
    val nw = n - 39
    assert(m(0L) == (n, nw, nw, n, 0L), s"doc0: ${m(0L)}")
    assert(m(1L) == (n, nw, nw, n, 0L), s"doc1: ${m(1L)}")
  }

  test("self-repetition inside one doc counts as duplication (corpus multiplicity)") {
    // a doc whose text repeats its own 50-char phrase: windows inside the
    // two copies collide with each other — multiplicity is corpus-wide,
    // not cross-doc
    val phrase = "unique self repeated phrase zz 0123456789 abcdef" // 48 chars
    val t = phrase + " ... filler between ... " + phrase
    val dir = writeDocs(Seq((7L, t)))
    val m = run(dir)
    val (nc, nw, starts, dup, keep) = m(7L)
    assert(nc == t.length.toLong && nw == nc - 39)
    assert(starts >= 2L && dup >= 40L && keep == nc - dup,
      s"self-repeat must flag spans: ${m(7L)}")
  }

  test("hash-key census path is row-identical to the raw-substring key path") {
    import spark.implicits._
    // a corpus mixing every census regime: cross-doc duplicated block,
    // identical full docs, self-repetition, a clean long doc, a short doc
    // (pads: seeded random alphanumerics, distinct first chars — constant
    // pads would make all-pad windows self-similar)
    val rnd = new scala.util.Random(33L)
    def pad(head: Char, n: Int) = head + rnd.alphanumeric.take(n - 1).mkString.toLowerCase
    val block = "shared forty char block 0123456789 abcd" // 40 chars
    val same = pad('m', 120)
    val phrase = pad('r', 48)
    val docs = Seq(
      (0L, block + pad('q', 70)),
      (1L, block + pad('z', 70)),
      (2L, same), (3L, same),
      (4L, phrase + " mid " + phrase),
      (5L, pad('c', 200)),
      (6L, "tiny"))
      .toDF("doc_id", "t")
    val raw = DataPipelineQueries
      .substringDedupCensus(docs, w = 40, maxStart = 4000, hashKeys = false)
      .collect().map(_.toSeq).toSeq
    val hashed = DataPipelineQueries
      .substringDedupCensus(docs, w = 40, maxStart = 4000, hashKeys = true)
      .collect().map(_.toSeq).toSeq
    assert(raw == hashed, s"hash-key census diverged:\nraw   =$raw\nhashed=$hashed")
    // the fixture really exercises duplication (not a vacuously-equal zero grid)
    assert(raw.exists(r => r(4).asInstanceOf[Long] > 0L))
    // and the maxStart horizon parameterization caps the window census
    val capped = DataPipelineQueries
      .substringDedupCensus(docs, w = 40, maxStart = 50, hashKeys = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped(5L) == 50L, s"maxStart horizon must cap n_windows: $capped")
  }

  test("dq_embedding_drift flags exactly the dimension with an injected mean shift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("embdrift").toString
    val rnd = new scala.util.Random(5L)
    // 200 vectors, dim 8; odd ids (the "current" half) get +0.5 on dim 3
    // — float32-quantized like the physical fixture encoding
    (0 until 200).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian() * 0.01)
      if (i % 2 == 1) v(3) += 0.5
      (i.toLong, v.map(_.toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = EmbedQueries.queries("dq_embedding_drift")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getBoolean(6))).toMap
    assert(rows.size == 8)
    rows.foreach { case (dim, (nb, nc2, shift, drifted)) =>
      assert(nb == 100L && nc2 == 100L)
      if (dim == 3L)
        assert(drifted && shift > 400000L, s"dim 3 must drift: $shift")
      else
        assert(!drifted && shift <= 20000L, s"dim $dim must not drift: $shift")
    }
  }
}
