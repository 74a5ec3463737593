package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.t

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), "t1"),
    (2L, 10L, ts("2024-01-01 10:05:00"), "t2"),
    (3L, 10L, ts("2024-01-01 10:10:00"), "t3"),
    (4L, 20L, ts("2024-01-01 09:00:00"), "t4"))
    .toDF("trade_id", "acct", "ts", "tag")

  private val quotes = Seq(
    (100L, 10L, ts("2024-01-01 09:59:00"), 1.0),
    (101L, 10L, ts("2024-01-01 10:05:00"), 2.0), // exactly simultaneous with t2
    (102L, 10L, ts("2024-01-01 10:05:00"), 3.0), // same instant, higher id wins
    (103L, 10L, ts("2024-01-01 10:11:00"), 4.0), // after t3 — never visible
    (104L, 30L, ts("2024-01-01 00:00:00"), 9.0)) // other key
    .toDF("quote_id", "acct", "qts", "px")

  private def asof = AsOf.asOfJoin(trades, quotes, key = "acct",
    leftTime = "ts", rightTime = "qts", tieBreak = "quote_id",
    payload = Seq("quote_id", "px"))

  test("asOfJoin picks the latest right row at-or-before each left time") {
    val got = asof.select("trade_id", "asof_quote_id", "asof_px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    // t1: only the 09:59 quote precedes it
    assert(got(1L) == ((Some(100L), Some(1.0))))
    // t3: quotes at 10:05 are the latest ≤ 10:10; 10:11 is invisible
    assert(got(3L) == ((Some(102L), Some(3.0))))
  }

  test("asOfJoin at-or-before: an exactly simultaneous right row is visible, " +
      "greatest tieBreak wins the same-instant tie") {
    val row = asof.filter(col("trade_id") === 2L)
      .select("asof_quote_id", "asof_px").as[(Long, Double)].head()
    assert(row == ((102L, 3.0)))
  }

  test("asOfJoin is left-outer: no prior right row yields nulls, row kept") {
    val row = asof.filter(col("trade_id") === 4L)
      .select("asof_quote_id", "asof_px", "tag")
      .as[(Option[Long], Option[Double], String)].head()
    assert(row == ((None, None, "t4")))
  }

  test("asOfJoin keeps every left row exactly once") {
    assert(asof.count() === trades.count())
  }

  test("asOfJoin plans one exchange on the key, no nested-loop join") {
    val plan = asof.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("bandJoin equals the naive inequality join") {
    val li = t(spark, sfDir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    val bands = Seq(("low", 0.0, 10000.0), ("mid", 10000.0, 40000.0),
      ("high", 40000.0, 200000.0)).toDF("band", "lo", "hi")
    val bucketed = RangeJoin.bandJoin(li, "l_extendedprice", bands, "lo", "hi", 5000.0)
      .select("l_orderkey", "l_linenumber", "band")
      .as[(Long, Int, String)].collect().toSet
    val naive = li.join(bands,
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .select("l_orderkey", "l_linenumber", "band")
      .as[(Long, Int, String)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }

  test("bandJoin handles band edges: value == lo is in, value == hi is out") {
    val left = Seq((1L, 10.0), (2L, 20.0), (3L, 19.999999)).toDF("id", "v")
    val bands = Seq(("b", 10.0, 20.0)).toDF("band", "lo", "hi")
    val got = RangeJoin.bandJoin(left, "v", bands, "lo", "hi", 7.0)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("bandJoin plans an equi-join, not BroadcastNestedLoopJoin") {
    val li = t(spark, sfDir, "lineitem")
    val bands = Seq(("low", 0.0, 10000.0), ("high", 10000.0, 200000.0))
      .toDF("band", "lo", "hi")
    val plan = RangeJoin.bandJoin(li, "l_extendedprice", bands, "lo", "hi", 5000.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"))
  }
}
