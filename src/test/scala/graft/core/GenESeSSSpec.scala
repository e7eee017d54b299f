package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral acceptance per SURVEY.md §7.4: GenESeSS must recover known
  * generators (M2.cfg ground truth) within ε — bit-parity with the absent
  * C++ kernel is explicitly not the bar. */
class GenESeSSSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recovers M2's emission probabilities from sampled data") {
    val data = Pfsa.m2.sample(200000, seed = 11)
    val inferred = GenESeSS.inferSingle(spark, data, alphabetSize = 2,
      GenESeSS.Params(eps = 0.05))
    // M2 has 2 states with δ(q,σ)=σ: state ≡ last symbol. The inferred
    // machine must explain the data about as well as the generator itself.
    val sample2 = Pfsa.m2.sample(50000, seed = 12)
    val llkTrue = Llk.llk(sample2, Pfsa.m2)
    val llkInf = Llk.llk(sample2, inferred)
    assert(llkInf < llkTrue + 0.02, s"inferred $llkInf vs generator $llkTrue")
    // and must distinguish M2 data from M2_u data
    val dataU = Pfsa.m2u.sample(50000, seed = 13)
    assert(Llk.llk(dataU, inferred) > llkInf + 0.05)
  }

  test("inferAll fans out per cluster in one pass") {
    val seqs = Seq(
      (0, Pfsa.m2.sample(30000, 21).toSeq),
      (0, Pfsa.m2.sample(30000, 22).toSeq),
      (1, Pfsa.m2u.sample(30000, 23).toSeq),
      (1, Pfsa.m2u.sample(30000, 24).toSeq)).toDF("cluster", "symbols")
    val lib = GenESeSS.inferAll(spark, seqs, alphabetSize = 2, GenESeSS.Params(eps = 0.05))
    assert(lib.keySet == Set(0, 1))
    val m2data = Pfsa.m2.sample(20000, 25)
    val m2udata = Pfsa.m2u.sample(20000, 26)
    assert(Llk.llk(m2data, lib(0)) < Llk.llk(m2data, lib(1)))
    assert(Llk.llk(m2udata, lib(1)) < Llk.llk(m2udata, lib(0)))
  }

  test("long-form inference matches the array path machine-for-machine") {
    import org.apache.spark.sql.functions._
    // same corpus in both shapes: arrays for inferAll, (seq_id, t, symbol,
    // cluster) rows for inferAllLong — identical heap counts, skeletons,
    // and visit sweeps must produce IDENTICAL machines
    val data = Seq(
      (0L, 0, Pfsa.m2.sample(20000, 31).toSeq),
      (1L, 0, Pfsa.m2.sample(20000, 32).toSeq),
      (2L, 1, Pfsa.m2u.sample(20000, 33).toSeq),
      (3L, 1, Pfsa.m2u.sample(20000, 34).toSeq),
      (4L, 1, Seq[Byte](1))) // degenerate single-symbol member
    val seqs = data.map { case (_, c, s) => (c, s) }.toDF("cluster", "symbols")
    val long = data.flatMap { case (sid, c, s) =>
      s.zipWithIndex.map { case (sym, t) => (sid, t.toLong, sym, c) }
    }.toDF("seq_id", "t", "symbol", "cluster")
    val p = GenESeSS.Params(eps = 0.05)

    val cntArr = GenESeSS.ngramCounts(seqs, 4).collect()
      .map(r => (r.getInt(0), r.getSeq[Byte](1).toList, r.getInt(2)) -> r.getLong(3)).toMap
    val cntLong = GenESeSS.ngramCountsLong(long, 4).collect()
      .map(r => (r.getInt(0), r.getSeq[Byte](1).toList, r.getInt(2)) -> r.getLong(3)).toMap
    assert(cntArr == cntLong, "n-gram heaps diverged between array and long form")

    val libA = GenESeSS.inferAll(spark, seqs, alphabetSize = 2, p)
    val libL = GenESeSS.inferAllLong(spark, long, alphabetSize = 2, p)
    assert(libA.keySet == libL.keySet)
    for (c <- libA.keySet) {
      assert(libA(c).conn.map(_.toSeq).toSeq == libL(c).conn.map(_.toSeq).toSeq,
        s"cluster $c skeleton diverged")
      assert(libA(c).pitilde.map(_.toSeq).toSeq == libL(c).pitilde.map(_.toSeq).toSeq,
        s"cluster $c emissions diverged")
      assert(libA(c).symFrq.toSeq == libL(c).symFrq.toSeq)
    }
    // and the plan really is array-free
    val plan = GenESeSS.ngramCountsLong(long, 4).queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan)
  }

  test("long-form visit sweep survives scattered partitions (serialize + run merge)") {
    import org.apache.spark.sql.functions._
    // scatter rows by t-block WITHOUT presorting: partial aggregation folds
    // per-partition mid runs, buffers SERIALIZE across the exchange, and the
    // final merge composes transition functions — the distributed shape the
    // pre-partitioned fit plan never exercises
    val data = Seq(
      (0L, 0, Pfsa.m2.sample(5000, 41).toSeq),
      (1L, 1, Pfsa.m2u.sample(5000, 42).toSeq))
    val seqs = data.map { case (_, c, s) => (c, s) }.toDF("cluster", "symbols")
    val long = data.flatMap { case (sid, c, s) =>
      s.zipWithIndex.map { case (sym, t) => (sid, t.toLong, sym, c) }
    }.toDF("seq_id", "t", "symbol", "cluster")
      .repartition(8, expr("cast(t / 100 as int)"))
      .sortWithinPartitions("seq_id", "t")
    val p = GenESeSS.Params(eps = 0.05)
    val libA = GenESeSS.inferAll(spark, seqs, alphabetSize = 2, p)
    val libL = GenESeSS.inferAllLong(spark, long, alphabetSize = 2, p, presort = false)
    assert(libA.keySet == libL.keySet)
    for (c <- libA.keySet) {
      assert(libA(c).conn.map(_.toSeq).toSeq == libL(c).conn.map(_.toSeq).toSeq)
      // visit counts are integers, so even via matrix-run composition the
      // emissions must be EXACTLY equal
      assert(libA(c).pitilde.map(_.toSeq).toSeq == libL(c).pitilde.map(_.toSeq).toSeq,
        s"cluster $c emissions diverged under scattered partitions")
    }
  }

  test("degenerate input yields a usable 1-state machine") {
    val p = GenESeSS.inferSingle(spark, Array[Byte](1), alphabetSize = 2)
    assert(p.numStates == 1)
    assert(math.abs(p.pitilde(0).sum - 1.0) < 1e-9)
  }

  test("tarjan SCC matches reference DirectedGraph.find_scc semantics") {
    // graph: 0→1→2→0 (one SCC), 3→4 (two singleton SCCs), 2→3
    val adj = IndexedSeq(Seq(1), Seq(2), Seq(0, 3), Seq(4), Seq.empty[Int])
    val scc = GenESeSS.tarjan(5, adj)
    assert(scc(0) == scc(1) && scc(1) == scc(2))
    assert(scc(3) != scc(0) && scc(4) != scc(3))
    assert(scc.max + 1 == 3)
  }
}
