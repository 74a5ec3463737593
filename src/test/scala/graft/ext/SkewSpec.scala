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
}
