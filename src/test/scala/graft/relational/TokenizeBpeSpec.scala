package graft.relational

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE trainer against a BY-HAND merge trajectory (the classic
  * low/lower/newest/widest corpus, worked out on paper: overlapping pair
  * counts, (count desc, left, right) tie-breaks, greedy left-to-right
  * application) and the doubled-symbol run case where greedy scanning is
  * the part that can silently go wrong ("aaaa" under (a,a) must become
  * [aa, aa], then [aaaa] — never [aa, a, a]). */
class TokenizeBpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def trainOn(texts: Seq[String]): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpespec").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "web", "en", t) }
      .toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    DataPipelineQueries.queries("tokenize_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("Sennrich corpus: the full 12-step merge trajectory matches the hand computation") {
    // words: low x3, lower x2, newest x4, widest x1
    val got = trainOn(Seq(
      "low low low", "lower lower", "newest newest newest newest", "widest"))
    val want = Seq(
      (1, "w", "e", 6L),      // we: lower x2 + newest x4
      (2, "l", "o", 5L),      // tie with (s,t) at 5 -> 'l' < 's'
      (3, "s", "t", 5L),
      (4, "e", "we", 4L),     // tie at 4 -> 'e' < 'n' < 'we'
      (5, "ewe", "st", 4L),   // tie at 4 -> 'ewe' < 'n'
      (6, "n", "ewest", 4L),
      (7, "lo", "w", 3L),
      (8, "lo", "we", 2L),    // tie at 2 -> 'lo' < 'we'
      (9, "lowe", "r", 2L),
      (10, "d", "e", 1L),     // all-1 tie -> (d,e) first lexicographically
      (11, "de", "st", 1L),
      (12, "i", "dest", 1L))
    assert(got == want, s"trajectory diverged:\n got=$got\nwant=$want")
  }

  test("doubled-symbol runs merge greedily left-to-right, then training runs dry") {
    // aaaa x2: (a,a) counts 3 pairs/word (overlapping), merges to [aa,aa]
    // (parity rule), NOT [aa,a,a]; then (aa,aa) -> aaaa; then (a,b); then
    // no pairs remain -> only 3 of the 12 requested steps emit
    val got = trainOn(Seq("aaaa aaaa", "ab"))
    val want = Seq(
      (1, "a", "a", 6L),
      (2, "aa", "aa", 2L),
      (3, "a", "b", 1L))
    assert(got == want, s"run handling diverged:\n got=$got\nwant=$want")
  }

  test("trained tokenization still concatenates back to the original words") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // re-run the fold with the trained merges over the corpus words and
    // check the structural invariant a tokenizer must keep: tokens join
    // back to the word, and every token is either a char or a trained merge
    val texts = Seq("low low low", "lower lower", "newest newest newest newest", "widest")
    val merges = trainOn(texts)
    val words = texts.flatMap(_.split(" ")).distinct
    val folded = words.map { w =>
      var toks = w.map(_.toString).toList
      merges.foreach { case (_, l, r, _) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        toks.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r)
            out(out.length - 1) = l + r
          else out += x
        }
        toks = out.toList
      }
      w -> toks
    }
    folded.foreach { case (w, toks) =>
      assert(toks.mkString == w, s"$w lost characters: $toks")
    }
    val vocabOk = folded.flatMap(_._2).toSet
    val trained = merges.map { case (_, l, r, _) => l + r }.toSet
    vocabOk.foreach { t =>
      assert(t.length == 1 || trained.contains(t), s"token $t is not a trained merge")
    }
  }
}
