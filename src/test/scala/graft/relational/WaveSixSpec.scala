package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Feature hashing, scene-cut detection, and 2-hop reachability (round-8
  * wave 6). Oracle parity runs at the gate; these pin the hash-bucket
  * determinism and mass balance, the frame/cut geometry, and the k-hop
  * set algebra against a driver recompute of the same k-NN edges.
  */
class WaveSixSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------- feature hashing
  test("feature_hash: buckets in [0,64), mass equals the token count, idempotent hashing") {
    val rows = SearchQueries.queries("feature_hash")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    val totalTokens = Tables.tbl(spark, sf, "documents")
      .select(explode(graft.text.TextOps.tokens("text"))).count()
    assert(rows.map(_.getLong(2)).sum === totalTokens,
      "every token lands in exactly one bucket")
    // same token -> same bucket everywhere: recompute one token's bucket
    val probe = spark.sql(
      "SELECT (IF(ascii(substr(hx,1,1)) >= 97, ascii(substr(hx,1,1)) - 87, ascii(substr(hx,1,1)) - 48) * 16" +
        " + IF(ascii(substr(hx,2,1)) >= 97, ascii(substr(hx,2,1)) - 87, ascii(substr(hx,2,1)) - 48)) % 64" +
        " FROM (SELECT md5('spark') AS hx)").head.getInt(0)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("spark".getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hv(c: Char) = if (c >= 'a') c - 87 else c - 48
    assert(probe === (hv(md5hex(0)) * 16 + hv(md5hex(1))) % 64,
      "bucket derivation equals an independent md5 recompute")
  }

  // --------------------------------------------------------- scene detect
  test("multimodal_scene_detect: exact frame means, cut iff |diff| > 2") {
    val rows = SeriesQueries.queries("multimodal_scene_detect")(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = Tables.tbl(spark, sf, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val bytes = texts(doc).getBytes("ISO-8859-1")
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.length === bytes.length / 64, s"doc $doc: frame count")
      sorted.foreach { r =>
        val f = r.getLong(1).toInt
        val exp = bytes.slice(f * 64, f * 64 + 64).map(_ & 0xff).sum / 64.0
        assert(r.getDouble(2) === exp, s"doc $doc frame $f: exact mean")
      }
      assert(sorted.head.isNullAt(3) && !sorted.head.getBoolean(4),
        s"doc $doc: first frame has no predecessor and no cut")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDouble(3) === b.getDouble(2) - a.getDouble(2), "diff is the lag delta")
          assert(b.getBoolean(4) === (math.abs(b.getDouble(3)) > 2.0), "cut rule")
        case _ => ()
      }
    }
  }

  // ----------------------------------------------------------- 2-hop reach
  test("graph_khop matches a driver recompute of the 2-hop closure") {
    val rows = AnalyticsQueries.queries("graph_khop")(spark, sf).collect()
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.length === emb.size, "one row per node")
    def r6(x: Double) = GraphTestUtil.r6(x)
    // same bucketed ANN edge build as the engine (GraphTestUtil is the
    // third independent implementation beside the plan and the oracle)
    val edges: Map[Long, Seq[Long]] =
      GraphTestUtil.annEdges(emb).withDefaultValue(Seq.empty)
    rows.foreach { r =>
      val src = r.getLong(0)
      val reach = (edges(src) ++ edges(src).flatMap(edges)).toSet - src
      assert(r.getLong(1) === reach.size.toLong, s"node $src: 2-hop set size")
      assert(r.getDouble(2) === r6(reach.size / 3.0), s"node $src: expansion ratio")
    }
    // sanity: expansion strictly above 1 somewhere (hop-2 adds nodes) and
    // bounded by 1 + k (k direct + k^2 two-hop candidates, minus overlap)
    assert(rows.exists(_.getLong(1) > 3))
    assert(rows.forall(_.getLong(1) <= 3 + 9))
  }
}
