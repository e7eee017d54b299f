package graft.relational

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, IsNotNull, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}

/** Dev-only auditor for the r15 verdict's top ask ("sweep the explode
  * inferred-filter tax"). Mechanism, pinned against the Spark 4.1.2
  * bytecode and probe plans this round:
  *
  * `InferFiltersFromGenerate` only fires when the generator child is an
  * ATTRIBUTE (the rule's `input.isInstanceOf[Attribute]` guard — inline
  * expression children like `explode(regexp_extract_all(...))` infer
  * NOTHING). The tax appears when a query names the array first
  * (`select(expensive.as("toks")).select(explode(col("toks")))`): the
  * inferred `size(toks) > 0 AND isnotnull(toks)` is then pushed through
  * the Project by PushPredicateThroughNonJoin, re-inlining the expensive
  * expression into an interpreted Filter — evaluated TWICE there (size +
  * isnotnull) on every input row, tripling the generator-expression work.
  * Attribute children materialized by a barrier (parquet scan, cached
  * relation, localCheckpoint, Aggregate output) stay cheap: the filter
  * reads the stored column.
  *
  * So instead of blind-converting all ~90 explode sites to outer form,
  * this main walks EVERY registered batch query's optimizedPlan and flags
  * Filter conditions where a Size or IsNotNull wraps a NON-attribute
  * expression tree — exactly the re-inlined shape. Streaming gate queries
  * are skipped (their in-stream plans aren't reachable from the returned
  * sink frame; the r15 fixes already converted the four ingest screens).
  *
  * Usage: `runMain graft.relational.ExplodeTaxAudit <sfDir> [namePrefix]`
  * — prints one line per flagged query with the offending filter snippet.
  * Never invoked by the driver; classpath-only cost. */
object ExplodeTaxAudit {

  /** The inferred-tax shape: size(<computed>) or isnotnull(<computed>)
    * where <computed> is a non-trivial expression (not an attribute or
    * simple field access). GetStructField/GetArrayItem over an attribute
    * is cheap and shows up in unrelated hand-written predicates, so only
    * flag when the wrapped tree contains a function-like node. */
  private def taxed(cond: Expression): Seq[String] = {
    def computed(e: Expression): Boolean = e match {
      case _: Attribute => false
      case other => other.references.nonEmpty && other.children.nonEmpty
    }
    val hits = scala.collection.mutable.ArrayBuffer[String]()
    cond.foreach {
      case s @ Size(child, _) if computed(child) =>
        hits += s"size: ${s.sql.take(160)}"
      case n @ IsNotNull(child) if computed(child) =>
        hits += s"isnotnull: ${n.sql.take(160)}"
      case _ =>
    }
    hits.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefix = args.drop(1).headOption.getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith(prefix)).filterNot(_.startsWith("stream_"))
    names.foreach { name =>
      try {
        val plan: LogicalPlan =
          graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan
        val hits = plan.collect { case f: Filter => taxed(f.condition) }.flatten
        if (hits.nonEmpty) {
          flagged += 1
          println(s"[tax] $name")
          hits.distinct.foreach(h => println(s"      $h"))
        }
      } catch {
        case e: Throwable =>
          println(s"[err] $name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    println(s"[tax] flagged $flagged of ${names.size} audited queries")
    spark.stop()
  }
}
