package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair set — the
  * group-assembly step every near-dup pipeline needs AFTER pair
  * generation: verified pairs say "these two are duplicates", components
  * say "this is the duplicate GROUP and this member is canonical".
  *
  * Min-label propagation: every node starts labeled with itself; each
  * round a node takes the minimum of its own and its neighbors' labels.
  * One round = one key-partitioned join + one map-side-combinable min
  * aggregate — no driver-side data, no collect — so a round costs two
  * exchanges of the (bounded, output-sized) edge/label frames at any
  * corpus scale. Rounds needed = component diameter; near-dup groups are
  * near-cliques (diameter 1–2), so the default cap is generous. (For
  * adversarially long chains the classic upgrade is pointer-jumping /
  * alternating large-small stars for O(log n) rounds — not needed for
  * dedup-shaped graphs, where the cap plus the convergence check is the
  * simpler honest design.)
  *
  * Convergence is detected by the label-sum invariant: labels only ever
  * decrease, so an unchanged sum means an unchanged labeling — one cheap
  * scalar aggregate per round instead of a join-and-diff. */
object Components {

  /** @param nodes one row per node, column `id`
    * @param pairs  undirected edges, columns `a`, `b`
    * @return (id, component) — component = the minimum node id reachable */
  def minLabel(nodes: DataFrame, pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
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
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint(true) // cut lineage per round — 20 chained joins
                               // would otherwise replan from the source
      val s = labelSum(next)
      converged = s == prevSum
      labels = next
      prevSum = s
      round += 1
    }
    // an unconverged labeling is WRONG (a component reported as several) —
    // fail loudly rather than return it; a graph that legitimately needs
    // more rounds has diameter > maxRounds, which dedup-shaped inputs
    // don't — raise maxRounds or implement pointer-jumping for those
    if (!converged)
      throw new IllegalStateException(
        s"Components.minLabel did not converge in $maxRounds rounds — " +
          "component diameter exceeds the cap; raise maxRounds")
    labels.select(col("id"), col("label").as("component"))
  }
}
