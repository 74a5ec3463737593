package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.SparkSpec
import graft.ops.t

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate equals the plain aggregation") {
    val li = t(spark, sfDir, "lineitem")
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), 16,
      saltSource = Seq("l_orderkey", "l_linenumber"),
      partialAggs = Seq(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("psum"),
        count(lit(1)).as("pcnt")),
      finalAggs = Seq(
        sum(col("psum")).cast(DoubleType).as("sum_qty"),
        sum(col("pcnt")).as("cnt")))
      .orderBy("l_returnflag").as[(String, Double, Long)].collect().toSeq
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag").as[(String, Double, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("salted partial phase spreads a hot key over multiple cells") {
    val hot = Seq.fill(1000)(("HOT", 1.0)).toDF("k", "v")
    val salted = hot.withColumn("__salt", Skew.salt(8, Seq(col("v") + rand())))
    val cells = salted.groupBy("k", "__salt").count()
    assert(cells.count() > 1) // the single key occupies several salt cells
  }

  test("saltedJoin preserves inner-join semantics exactly") {
    val li = t(spark, sfDir, "lineitem")
    val sup = t(spark, sfDir, "supplier")
    val salted = Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey", 8)
      .groupBy("s_name").count().orderBy("s_name")
      .as[(String, Long)].collect().toSeq
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_name").count().orderBy("s_name")
      .as[(String, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin left-outer keeps unmatched large-side rows exactly once") {
    val large = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("fk", "payload")
    val dim = Seq((1L, "d1"), (2L, "d2")).toDF("dk", "dname")
    val got = Skew.saltedJoin(large, dim, "fk", "dk", 4, "left")
      .select("fk", "payload", "dname").orderBy("fk")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(got == Seq((1L, "a", Some("d1")), (2L, "b", Some("d2")), (99L, "orphan", None)))
  }

  test("a planted hot LSH band-bucket is split by AQE's skew-join handling") {
    // Dedup.scala documents that a pathological hot bucket "would surface in
    // AQE's skew-join split" — this proves it. 3000 docs with IDENTICAL
    // minhash signatures put every banded row in ONE (band, h0, h1) bucket
    // per band; with production-shaped thresholds scaled to test data, AQE
    // must mark the partitions skewed and split them instead of running one
    // straggler task. (At 100 TB the default 256 MB threshold plays the
    // same role.)
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "1k")
      spark.conf.set(keys(1), "1k")
      // the hot bucket's rows share 3 of 4 columns and LZ4-compress ~4×
      // better than the singleton noise: its partition is 1.30× the median
      // in shuffle BYTES (the statistic AQE sees) despite holding 2× the
      // rows — factor 1.2 reflects that deterministic fixture
      spark.conf.set(keys(2), "1.2")
      spark.conf.set(keys(3), "-1") // force a shuffle join (both sides large at scale)
      // test-scale shuffles are a few KB; coalescing would fold the planted
      // hot partition into its neighbors before the skew rule ever sees it
      spark.conf.set(keys(4), "false")
      // docs 0–999: fully unique signatures (singleton buckets, no pairs).
      // docs 1000–5999: band 0 pinned to (7, 7) — ONE bucket holding 5000
      // rows while every other bucket holds one; the bucket's shuffle
      // partition is several × the median even after compression.
      val sig = spark.range(6000).select(
        col("id").as("doc_id"),
        array((0 until 8).map { i =>
          when(col("id") >= 1000 && lit(i) < 2, lit(7L))
            .otherwise(col("id") * 8 + i + 10000)
        }: _*).as("mh"))
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", "mh", 4, 2)
      // all pairs come from the hot bucket alone (separate plan, cheap)
      assert(cand.count() == 5000L * 4999 / 2)
      // execute THIS frame's own adaptive plan distributed — the 12.5M-pair
      // output stays on executors; collect()/count() would plan separately
      cand.queryExecution.toRdd.foreachPartition(_ => ())
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"), s"no skew split in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
