package graft.pipeline

/** Persisted-model row shapes (JSON replaces the reference's dill pickle,
  * detection.py:166-243). Matrices are row-major FLAT + dimensions — simple
  * shapes keep the codegen'd encoders happy. Package-visible (not nested
  * private) so generated encoder bytecode can reference them. */
private[pipeline] case class LibRow(cluster: Int, nStates: Int, k: Int,
    connFlat: Seq[Int], pitildeFlat: Seq[Double],
    symFrq: Seq[Double], annErr: Double, mrgEps: Double, synStr: Seq[Int])

private[pipeline] case class MetaRow(anomalySensitivity: Double, nClusters: Int,
    reduceClusters: Boolean, quantize: Boolean, quantizeType: String,
    nSymbols: Int, eps: Double, kmeansSeed: Long, cutoffs: Seq[Double],
    detrend: Boolean, hasComplex: Boolean, alphabetSize: Int,
    llkMeans: Seq[Double], llkStds: Seq[Double])
