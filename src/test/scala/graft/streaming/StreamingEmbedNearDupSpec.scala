package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Incremental embedding near-dup: a vector seen in trigger 1 must pair
  * with its near-identical twin arriving in trigger 2 (the keyed
  * sign-code bucket state), under-cap buckets surface EVERY qualifying
  * pair (the determinism contract the gate's oracle relies on), an
  * over-cap swarm stays bounded at the cap, and TTL expires occupants. */
class StreamingEmbedNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, StreamingNearDup.RocksDbProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // deterministic unit-ish vectors through float32 (the fixture's physical
  // encoding — spec-fixture-quantization rule); dim 64 covers 4×12 bits
  private def vec(seed: Long): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(64)(rnd.nextGaussian().toFloat.toDouble)
  }
  /** A tiny same-sign perturbation: scales every coordinate, so all sign
    * codes are preserved and the cosine stays ≈ 1. */
  private def scaled(v: Seq[Double], f: Double): Seq[Double] = v.map(_ * f)

  test("a twin arriving a trigger later pairs with the stored original") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Long, Seq[Double])]
      val query = StreamingEmbedNearDup.nearDupVecs(input.toDS().toDF("vec_id", "v"))
        .writeStream.format("memory").queryName("sembnd")
        .outputMode("append").start()
      try {
        input.addData((0L, vec(1L)), (5L, vec(2L)))
        query.processAllAvailable()
        assert(spark.table("sembnd").isEmpty, "unrelated vectors must not pair")
        input.addData((1L, scaled(vec(1L), 0.5)))
        query.processAllAvailable()
        val pairs = spark.table("sembnd").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).distinct.toSeq
        assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 1L)),
          s"expected exactly the cross-trigger pair: $pairs")
        assert(pairs.head._3 > 0.999999, s"scaled copy must score ~1: ${pairs.head._3}")
      } finally query.stop()
    }
  }

  test("identical vectors collide in all tables; consumers distinct the pair") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Long, Seq[Double])]
      val query = StreamingEmbedNearDup.nearDupVecs(input.toDS().toDF("vec_id", "v"))
        .writeStream.format("memory").queryName("sembnd_all")
        .outputMode("append").start()
      try {
        input.addData((10L, vec(7L)), (11L, vec(7L)))
        query.processAllAvailable()
        val hits = spark.table("sembnd_all").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        assert(hits.length == StreamingEmbedNearDup.DefaultTables,
          s"one hit per table: ${hits.toSeq}")
        assert(hits.forall(h => h._1 == 10L && h._2 == 11L && h._3 == 1.0))
        assert(hits.map(_._4).sorted.toSeq
          == (0 until StreamingEmbedNearDup.DefaultTables))
      } finally query.stop()
    }
  }

  test("under-cap bucket surfaces every qualifying pair in one batch (gate contract)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val base = vec(3L)
      val n = 6
      val input = MemoryStream[(Long, Seq[Double])]
      val query = StreamingEmbedNearDup.nearDupVecs(input.toDS().toDF("vec_id", "v"))
        .writeStream.format("memory").queryName("sembnd_full")
        .outputMode("append").start()
      try {
        // n same-sign scalings of one vector, single batch, cap 256 ≫ n:
        // ALL n·(n−1)/2 pairs must surface, arrival order irrelevant
        input.addData((0 until n).map(i => (i.toLong, scaled(base, 1.0 + i * 0.1))): _*)
        query.processAllAvailable()
        val pairs = spark.table("sembnd_full").collect()
          .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq.sorted
        val want = (for { a <- 0 until n; b <- a + 1 until n }
          yield (a.toLong, b.toLong)).sorted
        assert(pairs == want, s"under-cap bucket must be exhaustive: $pairs")
      } finally query.stop()
    }
  }

  test("an over-cap swarm keeps at most cap occupants per bucket") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val base = vec(4L)
      val cap = 8
      val input = MemoryStream[(Long, Seq[Double])]
      val query = StreamingEmbedNearDup.nearDupVecs(
          input.toDS().toDF("vec_id", "v"), maxBucketSize = cap)
        .writeStream.format("memory").queryName("sembnd_cap")
        .outputMode("append").start()
      try {
        input.addData((0 until 40).map(i => (i.toLong, scaled(base, 1.0 + i * 0.01))): _*)
        query.processAllAvailable()
        // a fresh arrival (trigger 2) scores only the stored cap: ≤ cap
        // new pairs per table, and always the cap members (smallest ids)
        input.addData((100L, scaled(base, 0.7)))
        query.processAllAvailable()
        val withNew = spark.table("sembnd_cap").collect()
          .filter(_.getLong(1) == 100L).map(_.getLong(0)).distinct.toSeq.sorted
        assert(withNew == (0L until cap.toLong),
          s"stored occupants must be exactly the $cap smallest ids: $withNew")
        val rows = sops(query)
        assert(rows.nonEmpty && rows.max <=
          cap.toLong * StreamingEmbedNearDup.DefaultTables,
          s"state rows ${rows.maxOption} must stay <= cap x tables")
      } finally query.stop()
    }
  }

  private def sops(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq.flatMap(p =>
      Option(p.stateOperators).toSeq.flatMap(_.toSeq)).map(_.numRowsTotal)

  test("TTL mode: an expired occupant no longer pairs; a fresh one does") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Long, Seq[Double])]
      val query = StreamingEmbedNearDup.nearDupVecs(
          input.toDS().toDF("vec_id", "v"),
          ttl = Some(java.time.Duration.ofMillis(300)))
        .writeStream.format("memory").queryName("sembnd_ttl")
        .outputMode("append").start()
      // processing-time mode keeps running no-data cleanup batches, so
      // processAllAvailable never settles — poll the sink instead (the
      // StreamingNearDupSpec TTL pattern)
      def pairsNow() = spark.table("sembnd_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq.sorted
      def waitFor(expect: Seq[(Long, Long)] => Boolean, what: String): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (!expect(pairsNow())) {
          assert(System.currentTimeMillis() < deadline,
            s"timed out waiting for $what; pairs = ${pairsNow()}")
          Thread.sleep(250)
        }
      }
      try {
        input.addData((0L, vec(9L)), (1L, scaled(vec(9L), 2.0)))
        waitFor(_.contains((0L, 1L)), "the in-TTL pair (0,1)")
        Thread.sleep(3000) // let every stored occupant's TTL lapse
        input.addData((2L, scaled(vec(9L), 3.0)), (3L, scaled(vec(9L), 4.0)))
        waitFor(_.contains((2L, 3L)), "the post-expiry pair (2,3)")
        assert(pairsNow() == Seq((0L, 1L), (2L, 3L)),
          s"expired occupants must not pair with fresh arrivals: ${pairsNow()}")
      } finally query.stop()
    }
  }
}
