package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.t

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = t(spark, sfDir, "documents")

  test("hashSample is deterministic and partition-layout independent") {
    val a = Sampling.hashSample(docs, "doc_id", 1, 10)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7, col("lang")), "doc_id", 1, 10)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("hashSample widening the threshold only adds rows (nested samples)") {
    val s1 = Sampling.hashSample(docs, "doc_id", 1, 10)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs, "doc_id", 2, 10)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s2))
    assert(s2.size > s1.size)
  }

  test("hashSample achieved fraction is near the requested one") {
    val n = docs.count().toDouble
    val k = Sampling.hashSample(docs, "doc_id", 1, 10).count().toDouble
    assert(math.abs(k / n - 0.1) < 0.05, s"got ${k / n}")
  }

  test("hashSample plans no shuffle") {
    val plan = Sampling.hashSample(docs, "doc_id", 1, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("shuffleShards plans exactly ONE hash exchange (on the shard key) " +
      "and no global sort") {
    val plan = Sampling.shuffleShards(docs, "doc_id", 7L, 8)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("stratifiedExact takes exactly ceil(fraction * n) rows per stratum") {
    val want = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), ceil(col("n") * 0.1).as("k"))
      .as[(String, Long)].collect().toMap
    val got = Sampling.stratifiedExact(docs, Seq("lang"), "doc_id", 0.1)
      .groupBy("lang").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("stratifiedExact membership is deterministic across re-runs") {
    def run() = Sampling.stratifiedExact(
        docs.repartition(5), Seq("lang"), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(run() == run())
  }

  test("stratifiedExact sample_rank is dense 1..k within each stratum") {
    val byLang = Sampling.stratifiedExact(docs, Seq("lang"), "doc_id", 0.1)
      .select("lang", "sample_rank").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    byLang.foreach { case (lang, ranks) =>
      assert(ranks == (1L to ranks.size), s"non-dense ranks for $lang")
    }
  }

  test("shuffleShards: every row lands in exactly one shard with dense " +
      "in-shard ranks; a new seed is a different permutation; re-runs and " +
      "layout changes reproduce it exactly") {
    val n = docs.count()
    val s1 = Sampling.shuffleShards(docs, "doc_id", seed = 7L, numShards = 8)
    assert(s1.count() == n) // a shuffle permutes, never drops
    // dense 1..k positions per shard
    val byShard = s1.select("shard", "shard_pos").as[(Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(byShard.keys.forall(s => s >= 0 && s < 8))
    byShard.foreach { case (s, ranks) =>
      assert(ranks == (1L to ranks.size), s"non-dense ranks in shard $s")
    }
    // deterministic across re-runs AND physical layout
    def order(df: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleShards(df, "doc_id", 7L, 8)
        .orderBy("shard", "shard_pos").select("doc_id").as[Long].collect().toSeq
    assert(order(docs) == order(docs.repartition(13)))
    // a different seed is a genuinely different permutation
    val o2 = Sampling.shuffleShards(docs, "doc_id", 8L, 8)
      .orderBy("shard", "shard_pos").select("doc_id").as[Long].collect().toSeq
    assert(order(docs) != o2)
  }
}
