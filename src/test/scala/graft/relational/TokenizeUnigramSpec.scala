package graft.relational

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the unigram-LM Viterbi segmentation against (a) a hand-computed
  * lattice where the winning path is decided by the length-sequence
  * tie-break, not the score, and (b) a full brute-force enumeration of
  * every segmentation with the same (score DESC, n ASC, lenseq DESC)
  * total order — the backward-DP-equals-argmax property the scaladoc
  * argues, checked on a corpus with long words, shared substrings, and
  * the over-cap word exclusion. */
class TokenizeUnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runOn(texts: Seq[String]): Seq[(String, String, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("unigramspec").toString
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, "web", "en", t) }
    import spark.implicits._
    rows.toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    DataPipelineQueries.queries("tokenize_unigram")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
  }

  // the spec's own vocabulary + weights, straight from the definition
  private def vocabOf(words: Map[String, Long]): Map[String, Long] = {
    val freq = scala.collection.mutable.Map.empty[(String, Int), Long]
    for ((w, c) <- words; p <- 0 until w.length;
         l <- 1 to math.min(DataPipelineQueries.UnigramMaxPiece, w.length - p)) {
      val piece = w.substring(p, p + l)
      freq((piece, l)) = freq.getOrElse((piece, l), 0L) + c
    }
    val letters = freq.collect { case ((p, 1), f) => p -> f }
    val top = freq.toSeq.collect { case ((p, l), f) if l >= 2 => (p, l, f) }
      .sortBy { case (p, _, f) => (-f, p) }
      .take(DataPipelineQueries.UnigramVocabK)
      .map { case (p, l, f) => p -> f * l * l }
    (letters ++ top).toMap
  }

  // every composition of the word into vocab pieces, argmax'd by the
  // query's total order — the independent recompute the DP must match
  private def bruteBest(w: String, voc: Map[String, Long]): (String, Long, Long) = {
    def paths(pos: Int): Seq[(Long, List[Int])] =
      if (pos == w.length) Seq((0L, Nil))
      else for {
        l <- 1 to math.min(DataPipelineQueries.UnigramMaxPiece, w.length - pos)
        wt <- voc.get(w.substring(pos, pos + l)).toSeq
        (s, rest) <- paths(pos + l)
      } yield (wt + s, l :: rest)
    val (score, lens) = paths(0).maxBy { case (s, ls) =>
      (s, -ls.length.toLong, ls.map(_.toString).mkString) // lenseq DESC = max
    }
    val pieces = lens.scanLeft(0)(_ + _).sliding(2)
      .map { case Seq(a, b) => w.substring(a, b) }.mkString(" ")
    (pieces, lens.length.toLong, score)
  }

  test("length-sequence tie-break: 'spark' splits spar|k, not s|park") {
    // single 5-char word: 4+1 and 1+4 both score 17·m with 2 pieces —
    // lenseq '41' > '14' must pick the long-first path
    val got = runOn(Seq("spark spark spark"))
    assert(got == Seq(("spark", "spar k", 2L, 51L)), got.toString)
  }

  test("words over the length cap are excluded; caps boundary included") {
    val in16 = "abcdefghijklmnop"        // 16 chars: kept
    val out17 = "abcdefghijklmnopq"      // 17 chars: dropped
    val got = runOn(Seq(s"$in16 $out17 $in16"))
    assert(got.map(_._1) == Seq(in16))
  }

  test("DP equals brute-force argmax on a shared-substring corpus") {
    val texts = Seq(
      "interoperate interoperate operate rate inter inter",
      "aaaa aaaaaaaa aab baa aaab",
      "low lower lowest newest widest widest nest nest nest",
      "x y z zz zzz zzzz xyzzy")
    val words = texts.flatMap(_.split(' ')).filter(_.nonEmpty)
      .filter(_.length <= DataPipelineQueries.UnigramMaxWord)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val voc = vocabOf(words)
    val want = words.keys.toSeq.sorted.map { w =>
      val (p, n, s) = bruteBest(w, voc); (w, p, n, s)
    }
    assert(runOn(texts) == want)
  }

  test("DP equals brute-force argmax on seeded random corpora") {
    Seq(31L, 77L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // skewed alphabet → shared substrings; lengths 1..12 under the cap
      val words = Seq.fill(60)(
        (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
      val texts = Seq(words.mkString(" "))
      val counts = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val voc = vocabOf(counts)
      val want = counts.keys.toSeq.sorted.map { w =>
        val (p, n, s) = bruteBest(w, voc); (w, p, n, s)
      }
      assert(runOn(texts) == want, s"random corpus diverged, seed $seed")
    }
  }

  test("pieces always reconstruct the word and stay inside the vocabulary") {
    val texts = Seq("banana bandana ana ban nab dan", "banana banana nabnab")
    val words = texts.flatMap(_.split(' ')).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val voc = vocabOf(words)
    for ((w, pieces, n, _) <- runOn(texts)) {
      assert(pieces.replace(" ", "") == w)
      val ps = pieces.split(' ').toSeq
      assert(ps.length.toLong == n)
      assert(ps.forall(voc.contains), s"$w -> $pieces")
    }
  }
}
