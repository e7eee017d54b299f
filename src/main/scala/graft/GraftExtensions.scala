package graft

import graft.core.Pfsa
import graft.functions.{LlkLongScore, LlkScoreAll}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native kernels, registered the idiomatic Spark way:
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) makes the
  * scoring expressions callable from PLAIN SQL — the entry point a
  * SQL-first deployment (Thrift server, notebooks, dbt-style pipelines)
  * actually uses, with no Scala in sight:
  *
  * {{{
  *   SELECT seq_id, graft_llk_score(symbols, '<model text>') FROM seqs
  *   SELECT seq_id, graft_llk_score_long(t, symbol, '<model text>')
  *   FROM long_form GROUP BY seq_id
  * }}}
  *
  * Models travel as FOLDABLE string literals in the reference's own
  * `%ANN_ERR/%PITILDE/%CONNX` text codec ([[Pfsa.fromText]] — the format
  * `sink_pfsa_file` writes), parsed ONCE at analysis time into the same
  * embedded-library expressions the Scala API plans
  * ([[LlkScoreAll]] codegen'd, [[LlkLongScore]] map-side-combinable), so
  * the SQL route pays zero per-row parsing and plans identically. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.llkScore)
    ext.injectFunction(GraftExtensions.llkScoreLong)
    ext.injectFunction(GraftExtensions.topKRows)
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.covMatrix)
    ext.injectFunction(GraftExtensions.bitmapDistinct)
    // first-class custom logical operators lower to composed Catalyst
    // plans in the optimizer (graft.plans.AsOfJoin)
    ext.injectOptimizerRule(_ => new graft.plans.LowerAsOfJoin)
  }
}

object GraftExtensions {

  private def parseLib(models: Seq[Expression], fn: String): Array[Pfsa] = {
    require(models.nonEmpty, s"$fn: at least one model text argument required")
    models.map { e =>
      require(e.foldable, s"$fn: model arguments must be string literals")
      val txt = e.eval()
      require(txt != null, s"$fn: model argument must not be null")
      Pfsa.fromText(txt.toString)
    }.toArray
  }

  /** graft_llk_score(symbols array<tinyint>, model_text+) → array<double> */
  private[graft] val llkScore = (
    FunctionIdentifier("graft_llk_score"),
    new ExpressionInfo(classOf[LlkScoreAll].getName, "graft_llk_score"),
    (args: Seq[Expression]) => {
      require(args.length >= 2,
        "graft_llk_score(symbols, model_text [, model_text ...])")
      LlkScoreAll(args.head, parseLib(args.tail, "graft_llk_score")): Expression
    })

  /** graft_top_k_rows(k, value double, id bigint) — bounded top-k-per-group
    * aggregate (O(k) state, map-side combinable); k must be a foldable
    * integer literal. */
  private[graft] val topKRows = (
    FunctionIdentifier("graft_top_k_rows"),
    new ExpressionInfo(classOf[graft.functions.TopKRows].getName, "graft_top_k_rows"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "graft_top_k_rows(k, value, id)")
      require(args.head.foldable, "graft_top_k_rows: k must be an integer literal")
      val k = args.head.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_top_k_rows: k must be integral, got $other")
      }
      graft.functions.TopKRows(k, args(1), args(2)): Expression
    })

  /** graft_vec_dot(a array<double>, b array<double>) → double — the native
    * codegen dot-product kernel under the similarity family, exposed to
    * plain SQL (cosine = graft_vec_dot(a,b)/(sqrt(graft_vec_dot(a,a)) *
    * sqrt(graft_vec_dot(b,b)))). */
  private[graft] val vecDot = (
    FunctionIdentifier("graft_vec_dot"),
    new ExpressionInfo(classOf[graft.functions.VecDot].getName, "graft_vec_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_vec_dot(a array<double>, b array<double>)")
      graft.functions.VecDot(args(0), args(1)): Expression
    })

  /** graft_cov_matrix(d, vec array<float|double>) — single-pass mergeable
    * covariance aggregate → array<struct<i,j,cov>> (upper triangle); d
    * must be a foldable integer literal. */
  private[graft] val covMatrix = (
    FunctionIdentifier("graft_cov_matrix"),
    new ExpressionInfo(classOf[graft.functions.CovMatrix].getName, "graft_cov_matrix"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_cov_matrix(d, vec)")
      require(args.head.foldable, "graft_cov_matrix: d must be an integer literal")
      val d = args.head.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_cov_matrix: d must be integral, got $other")
      }
      graft.functions.CovMatrix(d, args(1)): Expression
    })

  /** graft_bitmap_distinct(id bigint) — exact mergeable distinct-count
    * aggregate backed by a Roaring64 bitmap (compressed per-group state,
    * map-side combine, idempotent OR merge). */
  private[graft] val bitmapDistinct = (
    FunctionIdentifier("graft_bitmap_distinct"),
    new ExpressionInfo(classOf[graft.functions.BitmapDistinct].getName, "graft_bitmap_distinct"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_bitmap_distinct(id bigint)")
      graft.functions.BitmapDistinct(args.head): Expression
    })

  /** graft_llk_score_long(t bigint, symbol tinyint, model_text+) —
    * aggregate over long-form rows, one score array per group. */
  private[graft] val llkScoreLong = (
    FunctionIdentifier("graft_llk_score_long"),
    new ExpressionInfo(classOf[LlkLongScore].getName, "graft_llk_score_long"),
    (args: Seq[Expression]) => {
      require(args.length >= 3,
        "graft_llk_score_long(t, symbol, model_text [, model_text ...])")
      LlkLongScore(args(0), args(1),
        parseLib(args.drop(2), "graft_llk_score_long")): Expression
    })
}
