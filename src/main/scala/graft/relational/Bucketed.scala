package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-parquet source/sink — the co-located-join maneuver for the
  * 100-TB tier: two tables bucketed (and sort-merged) on the same key with
  * the same bucket count join WITHOUT any shuffle, because every bucket i
  * of A meets exactly bucket i of B on whatever executor reads it. For the
  * repeated seq_id-keyed joins this engine runs (labels ⋈ features ⋈
  * scores), pre-bucketing the hot tables converts every one of those
  * exchanges into a plain co-located scan — the difference between
  * re-shuffling 100 TB per query and shuffling it once at ingest.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`); the data
  * itself is ordinary parquet at `path`, so non-Spark readers see a normal
  * table and only Spark exploits the layout. BucketedSpec proves the
  * exchange-free plan (no ShuffleExchange under the sort-merge join) and
  * row-equality with the shuffled join. */
object Bucketed {

  /** Write `df` as a bucketed external parquet table registered as `name`
    * (replacing any previous registration): bucketed AND sorted by `key`,
    * so bucket-side sort-merge needs no per-task sort either. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    key: String, nBuckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $name")
    df.write.format("parquet").option("path", path)
      .bucketBy(nBuckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(name)
  }

  /** Equi-join of two registered bucketed tables on their bucket key —
    * with matching bucket counts this plans as a zero-exchange sort-merge
    * join (assert with `.queryExecution.executedPlan`). */
  def coLocatedJoin(s: SparkSession, a: String, b: String, key: String): DataFrame =
    s.table(a).join(s.table(b), Seq(key))
}
