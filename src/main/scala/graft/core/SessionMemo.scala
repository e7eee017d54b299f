package graft.core

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Session-scoped memo of a derived artifact keyed by (session, canonical
  * data dir) — the amortized-serving pattern `similarity_index_reuse`
  * measures, factored out for every query family that consumes the same
  * derived object over the same corpus (the graph family's k-NN edge
  * relation, the pipeline family's fitted reference model). A production
  * deployment builds these once and serves many analytics from them; the
  * per-query cold build is the anti-pattern, not the amortization.
  *
  * Values must be pure driver-side data or session-owned frames (eagerly
  * localCheckpoint'ed), so a value's lifetime never outlives its key's
  * session. Entries of stopped sessions are evicted on the next lookup,
  * and `onEvict` (e.g. a temp-dir delete for values that name on-disk
  * artifacts) runs for each evicted value — plus once per surviving value
  * from a single JVM shutdown hook, so a long-lived multi-session process
  * cannot accumulate orphaned artifacts. A corpus REWRITTEN in place
  * under the same path within one live session would serve the stale
  * artifact — acceptable over immutable fixture data, and every call
  * site keeps an unmemoized bypass. */
final class SessionMemo[V](onEvict: V => Unit = (_: V) => (),
                           name: String = "") {
  private val m = TrieMap.empty[(SparkSession, String), V]
  private lazy val hookOnce: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => m.values.foreach(v => scala.util.Try(onEvict(v)))))

  def getOrBuild(s: SparkSession, dir: String)(build: => V): V = {
    hookOnce
    m.filterInPlace { case ((sess, _), v) =>
      val live = !sess.sparkContext.isStopped
      if (!live) scala.util.Try(onEvict(v))
      live
    }
    val key = (s, new java.io.File(dir).getCanonicalPath)
    m.get(key) match {
      case Some(v) => v
      case None =>
        // TrieMap.getOrElseUpdate is not atomic for the build side: two
        // racing callers would both run `build` and the loser's value —
        // possibly naming an on-disk artifact — would leak without
        // onEvict. putIfAbsent decides one winner; the loser evicts its
        // own freshly built value.
        val t0 = System.nanoTime()
        val built = build
        if (name.nonEmpty)
          SessionMemo.record(name, (System.nanoTime() - t0) / 1e9)
        m.putIfAbsent(key, built) match {
          case Some(winner) => scala.util.Try(onEvict(built)); winner
          case None => built
        }
    }
  }

  private[graft] def size: Int = m.size
}

/** Build-time ledger for NAMED memos — the r12 verdict's observability
  * ask: the one-time family builds (ANN edge table, dedup pair frame, LM
  * score table, fitted model) are paid by whichever gated query runs
  * first, and a bench artifact that can't tell build from serve makes
  * round-over-round per-query tables lie. Each named memo appends
  * (name, seconds) when its build lambda actually runs; Bench snapshots
  * the ledger around every query and reports the builds as their own
  * rows. Pure driver-side bookkeeping — no effect on values or plans. */
object SessionMemo {
  private val ledger =
    new java.util.concurrent.CopyOnWriteArrayList[(String, Double)]()

  private[core] def record(name: String, secs: Double): Unit =
    ledger.add((name, secs))

  /** Immutable snapshot of (memo name, build seconds) entries so far. */
  def buildLedger: Seq[(String, Double)] = {
    import scala.jdk.CollectionConverters._
    ledger.asScala.toSeq
  }
}
