package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-based sliding-window segmentation (reference split_streams,
  * detection.py:595-613): windows of `size` starting every `stride = size −
  * overlap` positions; incomplete trailing windows dropped.
  *
  * Scale design: each row expands into the ≤⌈size/stride⌉ windows that
  * contain it via `sequence`+`explode` — bounded blow-up, no driver loop, no
  * global sort; everything partitions by the stream key.
  */
object Segment {

  /** Long form (seqCol, tCol, …) → (seqCol, win_id, pos, …original cols…).
    *
    * `t` must be 0-based and dense per stream (use row_number upstream if
    * not). Window w covers positions [w·stride, w·stride+size). */
  def windows(df: DataFrame, size: Int, overlap: Int,
              seqCol: String = "seq_id", tCol: String = "t"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = count(lit(1)).over(Window.partitionBy(col(seqCol)))
    df.withColumn("__n", n)
      .withColumn("win_id", explode(sequence(
        greatest(lit(0L), ceil((col(tCol) - lit(size - 1)) / lit(stride.toDouble)).cast("long")),
        floor(col(tCol) / lit(stride.toDouble)).cast("long"))))
      .filter(col("win_id") * stride + size <= col("__n"))
      .withColumn("pos", col(tCol) - col("win_id") * stride)
      .drop("__n")
  }

  /** Windows as one row each: (seqCol, win_id, symbols: array<tinyint>),
    * ready for the llk/GenESeSS kernels. */
  def windowArrays(df: DataFrame, size: Int, overlap: Int,
                   seqCol: String = "seq_id", tCol: String = "t",
                   symCol: String = "symbol"): DataFrame =
    windows(df, size, overlap, seqCol, tCol)
      .groupBy(col(seqCol), col("win_id"))
      .agg(expr(s"transform(array_sort(collect_list(struct(pos, $symCol))), x -> x.$symCol)")
        .as("symbols"))
}
