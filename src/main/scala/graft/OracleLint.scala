package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Driver-compare hash-surface lint (SURVEY §2.10 contract).
  *
  * The driver's correctness gate round-trips the DuckDB oracle result
  * through pandas `.df()` and compares a stringified value hash against the
  * Spark parquet dump. Two whole classes of query are CORRECT yet fail that
  * surface, and both burned round 8 (CORRECTNESS_r08: `join_interval_overlap`,
  * `sort_zorder`, `embed_quantize_int8`):
  *
  *  1. DuckDB types integer `sum(...) OVER (...)` and `list_sum(...)` as
  *     HUGEINT; pandas converts HUGEINT to float64, so the oracle hashes
  *     `"1.0"` where Spark hashes `"1"`. Oracles must `CAST(... AS BIGINT)`.
  *  2. pandas cannot `sort_values` a list column (`lexsort_indexer →
  *     Categorical → factorize` crash), so no registered query may output
  *     an Array/Map/Struct column — list data travels string-joined
  *     (the `agg_groupby_collect` convention).
  *
  * Enforced in two places: [[Verify]] fails any query whose OUTPUT schema
  * violates (2) and stderr-flags any oracle matching (1)'s textual pattern;
  * DriverCompatLintSpec pins both detectors with planted violations so the
  * class cannot silently recur as the query surface grows.
  */
object OracleLint {
  /** Names of output columns the driver's pandas compare cannot sort/hash. */
  def complexCols(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if isComplex(f.dataType) => s"${f.name}:${f.dataType.simpleString}"
    }.toSeq

  private def isComplex(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** Textual flags for HUGEINT-producing DuckDB expressions that can reach
    * the result uncast. Heuristic by design (SQL text, not a parser); an
    * occurrence of `list_sum(...)` or windowed `sum(...) OVER ...` is SAFE
    * only when the surrounding text proves the HUGEINT is neutralized:
    *
    *  - wrapped in `CAST( ... )` directly;
    *  - preceded by `/` or followed by `/` — DuckDB integer division is
    *    true division, so the consuming column types DOUBLE (the ratio
    *    oracles: `n / sum(n) OVER ...`);
    *  - aliased `AS <name>` in a CTE whose alias is later consumed as
    *    `CAST(<name> ...)` or `/ <name>` (the agg_mode / ts_peak_hours
    *    shape: HUGEINT internal to the CTE, cast or ratio'd at projection).
    *
    * Anything else is flagged. Scope is the verified failure class
    * (round 8's sort_zorder / join_interval_overlap); plain GROUP BY sums
    * over integers are covered by the DuckDB `DESCRIBE`-based type lint in
    * scripts/oracle_type_lint.py, which sees real result types.
    */
  def hugeintRisks(sql: String): Seq[String] = {
    val lower = sql.toLowerCase(java.util.Locale.ROOT)
    val n = lower.length
    def skipWs(i0: Int): Int = { var i = i0; while (i < n && lower(i).isWhitespace) i += 1; i }
    def prevNonWs(i0: Int): Int = { var i = i0; while (i > 0 && lower(i - 1).isWhitespace) i -= 1; i - 1 }
    def castWrapped(start: Int): Boolean = {
      val e = prevNonWs(start) + 1
      e >= 5 && lower.substring(e - 5, e) == "cast("
    }
    // balanced close of the paren group opening at/after `from`; -1 if none
    def balancedEnd(from: Int): Int = {
      var i = lower.indexOf('(', from)
      if (i < 0) return -1
      var depth = 0
      while (i < n) {
        lower(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    // end of the whole risky expression: for list_sum the call's close; for
    // a windowed sum, past OVER and its named-window ident or (...) spec
    def windowEnd(argsClose: Int): Int = {
      var j = skipWs(argsClose + 1)
      if (!lower.regionMatches(j, "over", 0, 4)) return -1 // not windowed
      j = skipWs(j + 4)
      if (j < n && lower(j) == '(') balancedEnd(j)
      else { var k = j; while (k < n && (lower(k).isLetterOrDigit || lower(k) == '_')) k += 1; k - 1 }
    }
    def safeByContext(start: Int, exprEnd: Int): Boolean = {
      if (castWrapped(start)) return true
      val p = prevNonWs(start)
      if (p >= 0 && lower(p) == '/') return true
      // skip trailing integer +-* arithmetic (preserves HUGEINT) to find
      // the consuming token: `sum(x) OVER (...) - 1 AS idx` must still
      // resolve its fate through the alias
      var j = skipWs(exprEnd + 1)
      // directly multiplied by a decimal literal (`* 1.0`) → DOUBLE
      if (raw"^\*\s*\d+\.".r.findFirstIn(lower.substring(j)).isDefined) return true
      var progressed = true
      while (progressed) {
        progressed = false
        if (j < n && (lower(j) == '+' || lower(j) == '-' || lower(j) == '*')) {
          var k = skipWs(j + 1)
          if (k < n && lower(k).isDigit) {
            while (k < n && lower(k).isDigit) k += 1
            j = skipWs(k); progressed = true
          }
        }
      }
      if (j < n && lower(j) == '/') return true
      // consumed by a comparison (`>= 0`, `< thr`, …) → the column is BOOLEAN
      if (j < n && (lower(j) == '>' || lower(j) == '<' || lower(j) == '=')) return true
      if (lower.regionMatches(j, "as ", 0, 3)) {
        var k = skipWs(j + 3); val a0 = k
        while (k < n && (lower(k).isLetterOrDigit || lower(k) == '_')) k += 1
        val alias = lower.substring(a0, k)
        val rest = lower.substring(k)
        // alias neutralized downstream: cast, used as divisor/dividend, or
        // multiplied by a decimal literal (all type the consumer DOUBLE)
        if (alias.nonEmpty &&
            (rest.contains(s"cast($alias") ||
             raw"/\s*$alias\b".r.findFirstIn(rest).isDefined ||
             raw"\b$alias\s*/".r.findFirstIn(rest).isDefined ||
             raw"\b$alias\s*\*\s*\d+\.".r.findFirstIn(rest).isDefined ||
             raw"\d\.\d*\s*\*\s*$alias\b".r.findFirstIn(rest).isDefined))
          return true
      }
      false
    }
    val flags = collection.mutable.ArrayBuffer[String]()
    raw"list_sum\s*\(".r.findAllMatchIn(lower).foreach { m =>
      val end = balancedEnd(m.start)
      // a list_sum over DOUBLE elements types DOUBLE, not HUGEINT — the
      // `::DOUBLE` / `CAST(.. AS DOUBLE)` inside the lambda is the proof
      val doubleElems = end > 0 && lower.substring(m.start, end).contains("double")
      if (end > 0 && !doubleElems && !safeByContext(m.start, end))
        flags += s"uncast list_sum at char ${m.start} (HUGEINT → pandas float64)"
    }
    raw"(?<![a-z_])sum\s*\(".r.findAllMatchIn(lower).foreach { m =>
      val argsClose = balancedEnd(m.start)
      if (argsClose > 0) {
        val wEnd = windowEnd(argsClose)
        if (wEnd > 0 && !safeByContext(m.start, wEnd))
          flags += s"uncast windowed sum at char ${m.start} (HUGEINT → pandas float64)"
      }
    }
    flags.toSeq
  }
}
