package graft.pipeline

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Online anomaly detection with a GROWING pattern library — Spark-native
  * rebuild of the reference's `ContinuousStreamingDetection`
  * (detection.py:616-734).
  *
  * Semantics (detection.py:628-691): the stream is segmented into windows;
  * each window, in order, is scored against every PFSA in the current
  * library; if NO entry explains it (llk above that entry's mean +
  * sensitivity·std), the window's index is recorded as a pattern-emergence
  * time and a new PFSA is inferred from that single window
  * (detection.py:694-724), its llk stats bootstrapped from `bootstrapRepeats`
  * sampled paths plus the window itself (detection.py:726-734).
  *
  * Scale design: the per-stream fold is inherently order-dependent (later
  * windows see a library grown by earlier ones, SURVEY §7.4.3), so each
  * stream is one `mapGroups`/state-handler invocation — sequential WITHIN a
  * stream, parallel ACROSS streams. Everything the handler needs
  * (GenESeSS.inferLocal, Llk.llk, Pfsa.sample) is pure local Scala — no
  * nested Spark jobs, no driver round-trips; per-stream state is just the
  * library (KBs).
  *
  * Documented divergence (SURVEY §7.4.4): the reference OVERWRITES its global
  * llk mean/std scalars on every library add (detection.py:733-734) so all
  * previous patterns silently inherit the newest pattern's stats; we keep
  * per-entry stats, which is what the batch path (detection.py:472-499)
  * does and what the paper's threshold rule describes.
  */
object ContinuousDetection {

  final case class Params(
      windowSize: Int = 1000,
      windowOverlap: Int = 0,
      anomalySensitivity: Double = 1.0,
      quantize: Boolean = true,
      quantizeType: String = "simple",
      nSymbols: Int = 2,
      eps: Double = 0.1,
      bootstrapRepeats: Int = 100,
      seed: Long = 42L)

  /** One library entry: the PFSA plus ITS OWN llk stats (mean, sample std). */
  final case class LibEntry(pfsa: Pfsa, mean: Double, std: Double)
      extends Serializable

  /** Per-window result row: `emerged` marks pattern-emergence times
    * (detection.py:624,657,673); `closest` is the explaining / newly-born
    * library index; `n_patterns` the library size after the window. */
  final case class WindowScore(
      seq_id: Long, win_id: Long, emerged: Boolean, llk: Double,
      closest: Int, n_patterns: Int)

  /** Pure per-window state transition (the loop body, detection.py:661-676).
    *
    * @return (library after the window, emerged?, llk on the
    *         explaining/new entry, index of that entry)
    */
  def step(lib: Vector[LibEntry], symbols: Array[Byte], p: Params,
           seedBase: Long): (Vector[LibEntry], Boolean, Double, Int) = {
    // alphabet_size = max+1, NOT distinct count (detection.py:647-650;
    // load-bearing quirk per SURVEY §7.4.4)
    val alpha = if (symbols.isEmpty) 1 else symbols.map(_.toInt).max + 1
    val llks = lib.map { e =>
      if (alpha > e.pfsa.alphabetSize) Double.PositiveInfinity
      else Llk.llk(symbols, e.pfsa)
    }
    val unexplained = lib.isEmpty || lib.indices.forall { j =>
      llks(j) > lib(j).mean + p.anomalySensitivity * lib(j).std
    }
    if (!unexplained) {
      var best = 0
      var j = 1
      while (j < llks.length) { if (llks(j) < llks(best)) best = j; j += 1 }
      (lib, false, llks(best), best)
    } else {
      // birth of a new pattern: infer from this single window
      // (detection.py:673-676,694-724)
      val k = math.max(2, alpha)
      val pfsa = GenESeSS.inferLocal(symbols, k, GenESeSS.Params(eps = p.eps))
      // stats bootstrap: the window + seeded sample paths (detection.py:726-733)
      val own = Llk.llk(symbols, pfsa)
      val boot = Array.tabulate(p.bootstrapRepeats)(i =>
        Llk.llk(pfsa.sample(p.windowSize, seedBase + i), pfsa))
      val all = own +: boot.toVector
      val mean = all.sum / all.size
      val std =
        if (all.size < 2) 0.0
        else math.sqrt(all.map(v => (v - mean) * (v - mean)).sum / (all.size - 1))
      (lib :+ LibEntry(pfsa, mean, std), true, own, lib.size)
    }
  }

  /** Quantize + segment the long form `(seq_id, t, value)` into per-window
    * symbol arrays `(seq_id, win_id, symbols)`. */
  def segments(longDf: DataFrame, p: Params): DataFrame = {
    val quantized =
      if (!p.quantize) Quantize.passthrough(longDf)
      else p.quantizeType match {
        case "simple" => Quantize.simple(longDf)
        case "simple-second" => Quantize.simpleSecond(longDf)
        case "complex" =>
          Quantize.applyComplex(longDf, Quantize.fitComplex(longDf, nBins = p.nSymbols))
        case other => throw new IllegalArgumentException(s"unknown quantize_type: $other")
      }
    Segment.windowArrays(quantized, p.windowSize, p.windowOverlap)
  }

  /** Batch replay of the online loop over long-form input holding one or
    * many independent streams. Windows are folded in win_id order inside one
    * group handler per stream; streams parallelize across executors.
    *
    * A stream's windows are materialized in the handler for the sort — the
    * same per-stream memory the reference needs for its single in-memory
    * stream; at 100-TB scale the fleet of streams distributes while each
    * stream stays executor-sized.
    */
  def fitStream(spark: SparkSession, longDf: DataFrame, p: Params): DataFrame = {
    import spark.implicits._
    // Seq[Byte] (ArrayType(ByteType)), not Array[Byte] (Spark would demand
    // an up-cast to BINARY)
    segments(longDf, p)
      .select(col("seq_id").cast("long"), col("win_id").cast("long"), col("symbols"))
      .as[(Long, Long, Seq[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (sid: Long, it: Iterator[(Long, Long, Seq[Byte])]) =>
        val sorted = it.toArray.sortBy(_._2)
        var lib = Vector.empty[LibEntry]
        sorted.iterator.map { case (_, wid, syms) =>
          val (next, emerged, llk, closest) =
            step(lib, syms.toArray, p, seedBase = p.seed + sid * 7919L + wid * 104729L)
          lib = next
          WindowScore(sid, wid, emerged, llk, closest, lib.size)
        }
      }
      .toDF()
  }
}
