package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-D specs: WordPiece greedy max-munch (independent driver
  * re-derivation of the vocabulary and the longest-match rule),
  * standardization moments, periodogram structure. */
class WaveDSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("tokenize_wordpiece: pieces reconstruct the word; max-munch holds against a driver recompute") {
    val rows = DataPipelineQueries.queries("tokenize_wordpiece")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent vocab recompute: top-10 by (count desc, token asc) + letters
    val counts = Tables.tbl(spark, sf, "documents")
      .select(explode(graft.text.TextOps.tokens("text")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val top10 = counts.sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    val letters = ('a' to 'z').map(_.toString).toSet
    val startVoc = top10 ++ letters
    rows.foreach { r =>
      val (word, toks, n) = (r.getString(0), r.getString(1), r.getLong(2))
      val pieces = toks.split(" ").toSeq
      assert(pieces.length.toLong === n)
      assert(pieces.tail.forall(_.startsWith("##")), "continuations carry ##")
      assert(!pieces.head.startsWith("##"), "the start piece doesn't")
      assert(pieces.head + pieces.tail.map(_.drop(2)).mkString === word,
        s"pieces must reconstruct '$word'")
      // greedy: no start piece longer than the chosen first piece matches
      val chosen = pieces.head.length
      ((chosen + 1) to word.length).foreach { l =>
        assert(!startVoc.contains(word.take(l)),
          s"'$word': start piece of length $l was available but not taken")
      }
      if (top10.contains(word)) assert(n === 1L, s"top-10 word '$word' stays whole")
    }
    // the fixed continuation inventory genuinely fires (a multi-char ## piece)
    assert(rows.exists(_.getString(1).split(" ").exists(p =>
      p.startsWith("##") && p.length > 3)))
  }

  test("embed_standardize: per-dimension z-scores have mean 0 and sample std 1") {
    val rows = EmbedQueries.queries("embed_standardize")(spark, sf).collect()
    val byDim = rows.groupBy(_.getLong(1))
    assert(byDim.size === 64)
    byDim.foreach { case (i, rs) =>
      val zs = rs.map(_.getDouble(2))
      val m = zs.sum / zs.length
      val sd = math.sqrt(zs.map(z => (z - m) * (z - m)).sum / (zs.length - 1))
      assert(math.abs(m) < 1e-3, s"dim $i: standardized mean $m")
      assert(math.abs(sd - 1.0) < 1e-3, s"dim $i: standardized std $sd")
    }
  }

  test("multimodal_audio_vad: segments are maximal, disjoint, length-consistent; gate splits frames") {
    val rows = SeriesQueries.queries("multimodal_audio_vad")(spark, sf).collect()
    assert(rows.nonEmpty)
    var totalActive = 0L
    rows.groupBy(_.getLong(0)).foreach { case (doc, segs) =>
      val sorted = segs.sortBy(_.getLong(1))
      sorted.foreach { r =>
        assert(r.getLong(2) > r.getLong(1), s"doc $doc: empty segment")
        assert(r.getLong(3) === r.getLong(2) - r.getLong(1), "runs are dense")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) > a.getLong(2),
            s"doc $doc: adjacent segments must have merged (maximality)")
        case _ =>
      }
      totalActive += sorted.map(_.getLong(3)).sum
    }
    // the energy gate genuinely splits: some frames of the corpus are inactive
    val totalFrames = SeriesQueries.queries("multimodal_audio_rms")(spark, sf).count()
    assert(totalActive > 0 && totalActive < totalFrames)
  }

  test("ts_periodogram: 12 harmonics per type, exactly one peak, and the peak is the max") {
    val rows = SeriesQueries.queries("ts_periodogram")(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.length === 12, s"$t: one row per harmonic")
      assert(rs.count(_.getBoolean(3)) === 1, s"$t: exactly one peak")
      val peak = rs.find(_.getBoolean(3)).get
      assert(rs.forall(_.getDouble(2) <= peak.getDouble(2)), s"$t: peak is the max")
      assert(rs.forall(_.getDouble(2) >= 0.0))
    }
  }
}
