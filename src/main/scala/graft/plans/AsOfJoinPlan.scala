package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StringType}

/** AS-OF JOIN as a FIRST-CLASS Catalyst logical operator — the last rung
  * of the custom-operator ladder this engine exercises (native codegen
  * `Expression`s: VecDot/LlkScoreAll; `TypedImperativeAggregate`s:
  * CovMatrix/TopKRows/BitmapDistinct/LlkLongScore; SQL functions via
  * `SparkSessionExtensions`; and now a custom `LogicalPlan` node +
  * injected `Rule[LogicalPlan]`). The node gives users and tools a
  * declarative handle — it shows up in `df.explain` / the analyzed plan
  * as `AsOfJoin`, survives analysis as a resolved operator, and an
  * optimizer rule LOWERS it to the proven scale-safe composition
  * (`RelationalQueries.asofBucketed`: (key, ts-bucket) windows + a
  * bucket-count-sized carry stitch) before planning — the brief's
  * preference order honored: the SEMANTICS get a first-class operator,
  * the EXECUTION reuses composed built-ins rather than a hand-rolled
  * physical exec, so Tungsten/AQE/codegen apply untouched.
  *
  * Contract: `left` rows are events `(event_id long, <key>, ts_us long)`;
  * `right` rows are references `(<key>, ts_us long, ref_id long)`; output
  * appends the latest reference at-or-before each event and the lag —
  * the same shape pandas `merge_asof` produces and join_asof oracles. */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    key: String,
    bucketUs: Long,
    // the output is a constructor PARAMETER, not a generated val: every
    // tree transformation copies the node via withNewChildrenInternal,
    // and freshly-minted exprIds on each copy would orphan every parent
    // reference (the classic custom-LogicalPlan pitfall — observed as
    // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at BindReferences time)
    output: Seq[Attribute]) extends BinaryNode {

  override lazy val resolved: Boolean = left.resolved && right.resolved

  // the output attributes are MINTED here, not forwarded from the
  // children — declare them produced or CheckAnalysis reads them as
  // missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  // the node consumes its children's columns BY NAME (the lowering
  // re-resolves them), which Catalyst cannot see from `expressions` —
  // without declared references, ColumnPruning prunes the children to
  // empty Projects under a column-free consumer (observed: `.count()`
  // above the node leaves the lowering nothing to resolve against)
  override lazy val references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  def apply(left: LogicalPlan, right: LogicalPlan,
            key: String, bucketUs: Long): AsOfJoin = {
    // the key attribute's type must come from the LEFT child's matching
    // column: the lowered plan's Alias inherits that type, and a minted
    // attribute that disagrees (e.g. hardwired StringType under a bigint
    // key) leaves parents resolved against a schema the physical plan
    // never produces — internal analysis/codegen errors, not a clean one.
    // Matched through the session RESOLVER, not ==: Spark resolution is
    // case-insensitive by default, and an exact-only match would silently
    // fall back to StringType for a case-mismatched key every other API
    // accepts
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    val keyAttr = left.output.find(a => resolver(a.name, key))
      .map(a => AttributeReference(key, a.dataType, a.nullable)())
      .getOrElse(AttributeReference(key, StringType, nullable = true)())
    AsOfJoin(left, right, key, bucketUs, Seq(
      AttributeReference("event_id", LongType, nullable = true)(),
      keyAttr,
      AttributeReference("ts_us", LongType, nullable = true)(),
      AttributeReference("ref_id", LongType, nullable = true)(),
      AttributeReference("ref_ts_us", LongType, nullable = true)(),
      AttributeReference("lag_us", LongType, nullable = true)()))
  }
}

/** Lowers [[AsOfJoin]] to the bucketed-window composition. Output
  * attribute identities are preserved by re-aliasing the lowered plan's
  * columns onto the node's original exprIds, so parent operators keep
  * resolving — the invariant every plan-rewriting rule must hold. */
class LowerAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case aj: AsOfJoin =>
      val spark = SparkSession.active
      val lowered = graft.relational.RelationalQueries.asofBucketed(
        ColumnBridge.ofRows(spark, aj.left),
        ColumnBridge.ofRows(spark, aj.right),
        aj.key, aj.bucketUs)
      // extraOptimizations run AFTER the main optimizer batches, so the
      // substituted subtree must arrive already optimized (a raw analyzed
      // tree would carry operators the planner expects rewritten, e.g.
      // Deduplicate → Aggregate)
      val lp = lowered.queryExecution.optimizedPlan
      val byName = lp.output.map(a => a.name -> a).toMap
      val projection: Seq[NamedExpression] = aj.output.map { o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId)
      }
      Project(projection, lp)
  }
}

/** User-facing entry point. `spark.experimental.extraOptimizations` is
  * the public per-session hook; deployments on the conf route get the
  * same rule from `GraftExtensions`. Registration is idempotent. */
object AsOfJoinPlan {
  def asof(events: DataFrame, refs: DataFrame, key: String, bucketUs: Long): DataFrame = {
    val spark = events.sparkSession
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[LowerAsOfJoin]))
      spark.experimental.extraOptimizations = existing :+ new LowerAsOfJoin
    ColumnBridge.ofRows(spark,
      AsOfJoin(events.queryExecution.analyzed, refs.queryExecution.analyzed, key, bucketUs))
  }
}
