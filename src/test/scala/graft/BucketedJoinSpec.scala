package graft

import org.apache.spark.sql.functions._

import graft.ops.t

/**
 * Bucketed co-located joins (SURVEY §4 "Partitioning & shuffle"): writing
 * both join sides bucketed + sorted by the join key lets Spark plan the join
 * with ZERO exchanges — the 100 TB pattern for repeatedly-joined fact/dim
 * pairs, where one upfront bucketed write amortizes every later join's
 * shuffle away.
 */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val li = t(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = t(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")

    // disable auto-broadcast: at test scale the dim side would broadcast,
    // hiding the co-location property this spec pins (at cluster scale both
    // sides are too big to broadcast — the bucketed layout is the win)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum("l_quantity").as("qty"), first("o_totalprice").as("total"))
    val plan = try {
      joined.collect()
      joined.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    // bucketed scans satisfy the join's (and the aggregate's) required
    // distribution: no Exchange anywhere in the plan
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")

    // and the result matches the plain (shuffling) join
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum("l_quantity").as("qty"), first("o_totalprice").as("total"))
    assert(joined.orderBy("o_orderkey").collect().toSeq ==
      plain.orderBy("o_orderkey").collect().toSeq)
  }
}
