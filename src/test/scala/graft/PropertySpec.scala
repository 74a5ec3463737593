package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.gold.GoldBuilder
import graft.lake.LakeTable

/**
 * ScalaCheck properties for the merge/dedup core (SURVEY §5): random
 * key/sequence sets must satisfy
 *  - latestPerKey ≡ group-max semantics (one row per key, max sequence);
 *  - merge idempotence (replaying a source is a no-op);
 *  - merge convergence (strict-newer guarded batches commute).
 * Generators sampled across fixed seeds (Spark round-trips are too slow for
 * the default 100-case forAll; 8 seeded cases per property keep runtime
 * bounded while staying reproducible).
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.choose(0L, 8L)
    seq <- Gen.choose(0L, 20L)
    v <- Gen.alphaStr.map(_.take(4))
  } yield (k, new Timestamp(86400000L * seq), v)

  private val batchGen = Gen.listOfN(30, rowGen)

  private def sample(seed: Long): List[(Long, Timestamp, String)] =
    batchGen(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("latestPerKey equals group-max semantics on random batches") {
    for (seed <- 1L to 8L) {
      val rows = sample(seed)
      val df = rows.toDF("k", "seq", "v")
      val got = GoldBuilder(spark).latestPerKey(df, Seq("k"), "seq", Seq("v"))
        .select("k", "seq").as[(Long, Timestamp)].collect().toMap
      val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2.getTime).max).toMap
      assert(got.size == expect.size, s"seed=$seed")
      expect.foreach { case (k, maxSeq) =>
        assert(got(k).getTime == maxSeq, s"seed=$seed key=$k") }
    }
  }

  test("merge of a deduped batch is idempotent on random data") {
    for (seed <- 11L to 18L) {
      val rows = sample(seed)
      val t = LakeTable(spark, s"${tmpDir("prop_idem")}/t")
      val batch = GoldBuilder(spark)
        .latestPerKey(rows.toDF("k", "seq", "v"), Seq("k"), "seq", Seq("v"))
      t.create(batch.schema)
      t.merge(batch, Seq("k"), Some("s.seq >= t.seq"))
      val snap1 = t.read.orderBy("k", "seq", "v").collect().toSeq
      t.merge(batch, Seq("k"), Some("s.seq >= t.seq"))
      assert(t.read.orderBy("k", "seq", "v").collect().toSeq == snap1, s"seed=$seed")
    }
  }

  test("partitioned merge ≡ unpartitioned merge on random batches") {
    for (seed <- 31L to 36L) {
      val base = sample(seed).map(r => (r._1, s"p${r._1 % 3}", r._3))
        .toDF("k", "part", "v")
        .groupBy("k").agg(org.apache.spark.sql.functions.first("part").as("part"),
          org.apache.spark.sql.functions.first("v").as("v"))
      val src = sample(seed + 50).map(r => (r._1, s"p${r._1 % 3}", r._3))
        .toDF("k", "part", "v")
        .groupBy("k").agg(org.apache.spark.sql.functions.first("part").as("part"),
          org.apache.spark.sql.functions.first("v").as("v"))

      val plain = LakeTable(spark, s"${tmpDir("prop_plain")}/t")
      plain.overwrite(base)
      plain.merge(src, Seq("k"))

      val parted = LakeTable(spark, s"${tmpDir("prop_part")}/t")
      parted.overwrite(base, partitionBy = Some("part"))
      parted.merge(src, Seq("k"))

      val a = plain.read.orderBy("k", "part", "v").collect().toSeq
      val b = parted.read.orderBy("k", "part", "v").collect().toSeq
      assert(a == b, s"seed=$seed")
    }
  }

  test("change feed replay: snapshot(n-1) + feed(n) reconstructs snapshot(n)") {
    import org.apache.spark.sql.functions.col
    for (seed <- 41L to 44L) {
      val t = LakeTable(spark, s"${tmpDir("prop_cdf")}/t")
      val gb = GoldBuilder(spark)
      val batches = Seq(sample(seed), sample(seed + 100), sample(seed + 200))
      t.create(batches.head.toDF("k", "seq", "v").schema, enableChangeFeed = true)
      batches.foreach { rows =>
        t.merge(gb.latestPerKey(rows.toDF("k", "seq", "v"), Seq("k"), "seq", Seq("v")),
          Seq("k"), Some("s.seq >= t.seq"))
      }
      (1L to t.currentVersion).foreach { v =>
        val prev = t.readVersion(v - 1)
        val applied = t.readChangeFeed(v, Some(v))
          .filter(col("_change_type").isin("insert", "update_postimage"))
          .select("k", "seq", "v")
        val got = prev.join(applied.select("k"), Seq("k"), "left_anti")
          .unionByName(applied).orderBy("k", "seq", "v").collect().toSeq
        val want = t.readVersion(v).orderBy("k", "seq", "v").collect().toSeq
        assert(got == want, s"seed=$seed v=$v")
      }
    }
  }

  test("latest-wins merges converge on (k, seq) regardless of batch order") {
    for (seed <- 21L to 24L) {
      val rowsA = sample(seed); val rowsB = sample(seed + 100)
      val gb = GoldBuilder(spark)
      def dedup(rows: List[(Long, Timestamp, String)]) =
        gb.latestPerKey(rows.toDF("k", "seq", "v"), Seq("k"), "seq", Seq("v"))
      def runOrder(first: List[(Long, Timestamp, String)],
          second: List[(Long, Timestamp, String)], tag: String) = {
        val t = LakeTable(spark, s"${tmpDir(s"prop_conv_$tag")}/t")
        t.create(dedup(first).schema)
        t.merge(dedup(first), Seq("k"), Some("s.seq > t.seq"))
        t.merge(dedup(second), Seq("k"), Some("s.seq > t.seq"))
        t.read.select("k", "seq").as[(Long, Timestamp)].collect().toMap
      }
      val ab = runOrder(rowsA, rowsB, "ab")
      val ba = runOrder(rowsB, rowsA, "ba")
      assert(ab.keySet == ba.keySet, s"seed=$seed")
      // the final sequence per key is the global per-key max in either order
      ab.foreach { case (k, seq) => assert(ba(k) == seq, s"seed=$seed key=$k") }
    }
  }
}
