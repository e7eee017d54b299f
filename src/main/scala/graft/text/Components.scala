package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair set — the
  * group-assembly step every near-dup pipeline needs AFTER pair
  * generation: verified pairs say "these two are duplicates", components
  * say "this is the duplicate GROUP and this member is canonical".
  *
  * Min-label propagation WITH POINTER JUMPING: every node starts labeled
  * with itself; each round a node (1) takes the minimum of its own and
  * its neighbors' labels (one key-partitioned join + one
  * map-side-combinable min aggregate), then (2) jumps through the label
  * table — label ← label(label) — one more keyed join against the same
  * bounded (id, label) frame. The jump is what makes rounds logarithmic:
  * on a path graph the reach after round r satisfies d_r = 2·d_{r-1} + 1
  * = 2^r − 1 (step extends reach by one hop, jump doubles it), so a
  * component of diameter d converges in ~log₂(d) rounds instead of d.
  * This is the doubling idea behind the large-star/small-star and
  * hash-to-min MapReduce CC algorithms; the min-label formulation keeps
  * every round a pair of output-sized keyed joins — no driver-side data,
  * no collect, valid at any corpus scale.
  *
  * Invariant both steps preserve: l(u) is the id of a node in u's
  * component and l(u) ≤ u. Labels only ever decrease, so convergence is
  * detected by the label-sum invariant: an unchanged sum means an
  * unchanged labeling — one cheap scalar aggregate per round instead of
  * a join-and-diff. At a fixpoint l(u) = l(v) across every edge, so l is
  * constant per component, and since l(u) ≤ u that constant is the
  * component minimum. */
object Components {

  /** @param nodes one row per node, column `id`
    * @param pairs  undirected edges, columns `a`, `b`
    * @return (id, component) — component = the minimum node id reachable */
  def minLabel(nodes: DataFrame, pairs: DataFrame, maxRounds: Int = 50): DataFrame =
    minLabelWithRounds(nodes, pairs, maxRounds)._1

  /** [[minLabel]] plus the number of rounds it took to converge (the
    * convergence-detecting no-op round included) — the spec surface for
    * the O(log n) claim. */
  def minLabelWithRounds(nodes: DataFrame, pairs: DataFrame,
                         maxRounds: Int = 50): (DataFrame, Int) = {
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint(true)
    // coalesce: sum over ZERO rows is NULL — an empty node set must
    // converge immediately (0 == 0), not NPE in getLong
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = edges
        .join(labels.select(col("id").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a")).agg(min(col("nl")).as("nbr_min"))
        .select(col("a").as("id"), col("nbr_min"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
      // pointer jump through the PRE-step table (already materialized, so
      // one plan, one shuffle on label): label ← min(label, l_prev(label)).
      // l_prev(x) is in x's component and ≤ x, so the invariant holds; the
      // left join always matches (labels cover every node and a label is
      // always a node id) — coalesce is belt-and-braces.
      val next = stepped
        .join(labels.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint(true) // cut lineage per round — chained joins
                               // would otherwise replan from the source
      val s = labelSum(next)
      converged = s == prevSum
      labels = next
      prevSum = s
      round += 1
    }
    // an unconverged labeling is WRONG (a component reported as several) —
    // fail loudly rather than return it. With doubling the default cap
    // covers components of diameter ~2^50; hitting it means a bug, not a
    // deep graph.
    if (!converged)
      throw new IllegalStateException(
        s"Components.minLabel did not converge in $maxRounds rounds — " +
          "raise maxRounds (doubling makes this unreachable for any real graph)")
    (labels.select(col("id"), col("label").as("component")), round)
  }
}
