package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable.ZonePred

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Three appends with disjoint id/time ranges → three data dirs whose zone
   *  maps cleanly separate the ranges. */
  private def rangedTable(stats: Seq[String]): LakeTable = {
    val t = LakeTable(spark, tmpDir("zm"))
    val schema = Seq((0L, ts("2024-01-01 00:00:00"), 0.0))
      .toDF("id", "ts", "v").schema
    t.create(schema, statsColumns = stats)
    def batch(ids: Range, day: String) =
      ids.map(i => (i.toLong, ts(s"2024-01-$day 12:00:00"), i * 1.5))
        .toDF("id", "ts", "v").coalesce(1)
    t.append(batch(1 to 100, "01"))
    t.append(batch(101 to 200, "10"))
    t.append(batch(201 to 300, "20"))
    t
  }

  test("readWhere equals read.filter exactly, and skips files outside the range") {
    val t = rangedTable(Seq("id", "ts", "v"))
    val preds = Seq(ZonePred.between("id", "120", "180"))
    val got = t.readWhere(preds).select("id", "v")
      .as[(Long, Double)].collect().toSet
    val want = t.read.filter(col("id") >= 120 && col("id") <= 180)
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(got == want)
    assert(want.size == 61)
    val (kept, skipped) = t.skippingStats(preds)
    assert(kept == 1 && skipped == 2, s"kept=$kept skipped=$skipped")
  }

  test("timestamp zone maps prune on time ranges") {
    val t = rangedTable(Seq("ts"))
    val preds = Seq(ZonePred.atLeast("ts", "2024-01-15 00:00:00"))
    val (kept, skipped) = t.skippingStats(preds)
    assert(kept == 1 && skipped == 2)
    assert(t.readWhere(preds).count() == 100)
  }

  test("conjunction of predicates prunes the union of each one's exclusions") {
    val t = rangedTable(Seq("id", "ts"))
    val preds = Seq(
      ZonePred.atLeast("id", "101"),                  // excludes batch 1
      ZonePred.atMost("ts", "2024-01-15 00:00:00"))   // excludes batch 3
    val (kept, skipped) = t.skippingStats(preds)
    assert(kept == 1 && skipped == 2)
    assert(t.readWhere(preds).select("id").as[Long].collect().toSet ==
      (101L to 200L).toSet)
  }

  test("numeric comparison, not lexicographic: id 90..110 spans two files") {
    val t = rangedTable(Seq("id"))
    // lexicographically '90' > '200', so a string compare would wrongly
    // prune every file; numerically files 1 and 2 must both survive
    val preds = Seq(ZonePred.between("id", "90", "110"))
    val (kept, skipped) = t.skippingStats(preds)
    assert(kept == 2 && skipped == 1, s"kept=$kept skipped=$skipped")
    assert(t.readWhere(preds).count() == 21)
  }

  test("a table without stats columns never skips but stays correct") {
    val t = rangedTable(Nil)
    val preds = Seq(ZonePred.eq("id", "150"))
    val (kept, skipped) = t.skippingStats(preds)
    assert(skipped == 0 && kept == 3)
    assert(t.readWhere(preds).count() == 1)
  }

  test("all-null stats column keeps the file (absent stats never prune)") {
    val t = LakeTable(spark, tmpDir("zm_null"))
    val df = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "v")
    t.create(df.schema, statsColumns = Seq("v"))
    t.append(df.coalesce(1))
    val preds = Seq(ZonePred.atLeast("v", "99.0"))
    val (kept, skipped) = t.skippingStats(preds)
    assert(kept == 1 && skipped == 0)
    assert(t.readWhere(preds).count() == 0) // residual filter still applies
  }

  test("zone maps survive a partitioned merge: untouched dirs keep stats") {
    val t = LakeTable(spark, tmpDir("zm_merge"))
    val df0 = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("id", "part", "v")
    t.create(df0.schema, partitionBy = Some("part"), statsColumns = Seq("id", "v"))
    t.append(df0)
    // merge touches only partition b; partition a's file stats must survive
    t.merge(Seq((3L, "b", 31.0), (4L, "b", 40.0)).toDF("id", "part", "v"), Seq("id"))
    val predsA = Seq(ZonePred.atMost("id", "2"))
    val got = t.readWhere(predsA).select("id", "v").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 10.0), (2L, 20.0)))
    // id <= 2 lives only in partition a's file; the rewritten b file (ids
    // 3..4) must be skipped via its fresh stats
    val (kept, skipped) = t.skippingStats(predsA)
    assert(skipped >= 1, s"kept=$kept skipped=$skipped")
    assert(t.read.count() == 4)
  }

  test("readWhere on a multi-file append prunes within the dir") {
    val t = LakeTable(spark, tmpDir("zm_multi"))
    val df = spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(8, col("id")) // 8 files with disjoint id ranges
    t.create(df.schema, statsColumns = Seq("id"))
    t.append(df)
    val preds = Seq(ZonePred.between("id", "0", "100"))
    val (kept, skipped) = t.skippingStats(preds)
    assert(kept + skipped == 8)
    assert(skipped >= 6, s"kept=$kept skipped=$skipped")
    assert(t.readWhere(preds).count() == 101)
  }
}
