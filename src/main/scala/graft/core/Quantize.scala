package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Continuous → finite-alphabet quantization (reference detection.py:272-308;
  * entropy-max spec tex/ms.tex:293-294).
  *
  * All variants operate on the long form `(seq_id, t, value)` and append a
  * `symbol: tinyint` column — per-sequence windows only (no global sort), so
  * every path scales by partitioning on seq_id.
  */
object Quantize {

  private def seqW(seqCol: String, tCol: String) =
    Window.partitionBy(col(seqCol)).orderBy(col(tCol))

  /** quantize_simple (reference detection.py:289-292): first difference along
    * time then sign-threshold; first Δ := 0 → symbol 0. */
  def simple(df: DataFrame, seqCol: String = "seq_id", tCol: String = "t",
             valCol: String = "value"): DataFrame = {
    val d = coalesce(col(valCol) - lag(col(valCol), 1).over(seqW(seqCol, tCol)), lit(0.0))
    df.withColumn("symbol", when(d > 0, lit(1)).otherwise(lit(0)).cast("tinyint"))
  }

  /** quantize_simple_second (reference detection.py:293-296): second
    * difference (each diff's leading NaN filled with 0) then sign. */
  def simpleSecond(df: DataFrame, seqCol: String = "seq_id", tCol: String = "t",
                   valCol: String = "value"): DataFrame = {
    val w = seqW(seqCol, tCol)
    val d1 = coalesce(col(valCol) - lag(col(valCol), 1).over(w), lit(0.0))
    val withD1 = df.withColumn("__d1", d1)
    val d2 = coalesce(col("__d1") - lag(col("__d1"), 1).over(w), lit(0.0))
    withD1.withColumn("symbol", when(d2 > 0, lit(1)).otherwise(lit(0)).cast("tinyint"))
      .drop("__d1")
  }

  /** quantize_passthrough (reference detection.py:279-280): cast only. */
  def passthrough(df: DataFrame, valCol: String = "value"): DataFrame =
    df.withColumn("symbol", col(valCol).cast("tinyint"))

  /** Fitted entropy-maximizing partition (reference Quantizer,
    * detection.py:297-306): cutoffs chosen so bins carry ~equal mass, i.e.
    * the (1/k, 2/k, …) quantiles. Persisted so `predict` reuses the FITTED
    * partition (reference detection.py:224-226).
    *
    * @param cutoffs strictly increasing inner bin edges (k-1 of them)
    */
  final case class ComplexModel(cutoffs: Array[Double], detrend: Boolean)
      extends Serializable {
    def alphabetSize: Int = cutoffs.length + 1
  }

  /** Fit equal-mass cutoffs with `approxQuantile` — one distributed pass with
    * a bounded-size sketch per partition; no global sort (the exact-ntile
    * variant in RelationalQueries exists only as the DuckDB-matchable oracle).
    */
  def fitComplex(df: DataFrame, valCol: String = "value", nBins: Int = 8,
                 detrend: Boolean = false, relErr: Double = 1e-4,
                 seqCol: String = "seq_id", tCol: String = "t"): ComplexModel = {
    val base = if (detrend) {
      df.withColumn("__v",
        coalesce(col(valCol) - lag(col(valCol), 1).over(seqW(seqCol, tCol)), lit(0.0)))
    } else df.withColumn("__v", col(valCol))
    val probes = (1 until nBins).map(_.toDouble / nBins).toArray
    val cuts = base.stat.approxQuantile("__v", probes, relErr)
    ComplexModel(cuts.distinct.sorted, detrend)
  }

  /** Apply a fitted partition: symbol = #cutoffs ≤ value (branch-free
    * when-chain keeps it inside whole-stage codegen). */
  def applyComplex(df: DataFrame, model: ComplexModel, valCol: String = "value",
                   seqCol: String = "seq_id", tCol: String = "t"): DataFrame = {
    val v: Column = if (model.detrend)
      coalesce(col(valCol) - lag(col(valCol), 1).over(seqW(seqCol, tCol)), lit(0.0))
    else col(valCol)
    val sym = model.cutoffs.foldLeft(lit(0): Column)((acc, c) =>
      acc + when(v > c, 1).otherwise(0))
    df.withColumn("symbol", sym.cast("tinyint"))
  }
}
