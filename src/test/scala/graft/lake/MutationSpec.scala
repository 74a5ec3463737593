package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable.ZonePred

class MutationSpec extends SparkSpec {
  import spark.implicits._

  /** Three single-file appends with disjoint id ranges and zone maps on id. */
  private def ranged(): LakeTable = {
    val t = LakeTable(spark, tmpDir("mut"))
    val schema = Seq((0L, "", 0.0)).toDF("id", "tag", "v").schema
    t.create(schema, statsColumns = Seq("id", "v"))
    def batch(ids: Range, tag: String) =
      ids.map(i => (i.toLong, tag, i * 1.0)).toDF("id", "tag", "v").coalesce(1)
    t.append(batch(1 to 100, "a"))
    t.append(batch(101 to 200, "b"))
    t.append(batch(201 to 300, "c"))
    t
  }

  private def fileNames(t: LakeTable): Set[String] =
    t.read.select(input_file_name()).distinct().as[String].collect()
      .map(_.split('/').last).toSet

  test("delete removes exactly the matching rows and reports the count") {
    val t = ranged()
    val n = t.delete(Seq(ZonePred.between("id", "150", "250")))
    assert(n == 101)
    assert(t.read.count() == 199)
    assert(t.read.filter(col("id").between(150, 250)).count() == 0)
    assert(t.history.last._2 == "delete")
  }

  test("delete rewrites only files whose zone map admits a match — " +
      "untouched files are re-referenced (hard link, same physical file)") {
    val t = ranged()
    val before = fileNames(t)
    t.delete(Seq(ZonePred.between("id", "120", "130")))
    val after = fileNames(t)
    // batch-1 and batch-3 physical files survive verbatim; only the middle
    // file was rewritten under a new name
    assert((before intersect after).size == 2, s"$before vs $after")
    assert((after -- before).size == 1)
  }

  test("update assigns only matched rows and leaves the rest bit-identical") {
    val t = ranged()
    val n = t.update(Seq(ZonePred.between("id", "101", "110")),
      Map("v" -> (col("v") + 1000.0), "tag" -> lit("upd")))
    assert(n == 10)
    val got = t.read.filter(col("id").between(99, 112))
      .orderBy("id").select("id", "tag", "v")
      .as[(Long, String, Double)].collect().toSeq
    assert(got.filter(_._1 < 101).forall(r => r._2 != "upd"))
    assert(got.filter(r => r._1 >= 101 && r._1 <= 110)
      .forall(r => r._2 == "upd" && r._3 == r._1 + 1000.0))
    assert(got.filter(_._1 > 110).forall(r => r._2 == "b" && r._3 == r._1))
    assert(t.read.count() == 300)
    assert(t.history.last._2 == "update")
  }

  test("update refuses the partition column; mutations refuse empty predicates") {
    val t = LakeTable(spark, tmpDir("mut_p"))
    val df = Seq((1L, "x", 1.0)).toDF("id", "part", "v")
    t.create(df.schema, partitionBy = Some("part"))
    t.append(df)
    intercept[IllegalArgumentException] {
      t.update(Seq(ZonePred.eq("id", "1")), Map("part" -> lit("y")))
    }
    intercept[IllegalArgumentException] { t.delete(Nil) }
  }

  test("partitioned delete prunes by partition ownership and zone maps") {
    val t = LakeTable(spark, tmpDir("mut_part"))
    val df = (1 to 100).map(i => (i.toLong, if (i <= 50) "p1" else "p2", i * 1.0))
      .toDF("id", "part", "v")
    t.create(df.schema, partitionBy = Some("part"), statsColumns = Seq("id"))
    t.append(df)
    val n = t.delete(Seq(ZonePred.between("id", "10", "20")))
    assert(n == 11)
    assert(t.read.count() == 89)
    assert(t.read.filter(col("part") === "p2").count() == 50) // untouched
  }

  test("change feed records delete and update pre/post images") {
    val t = LakeTable(spark, tmpDir("mut_cdf"))
    val df = (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    t.create(df.schema, enableChangeFeed = true, statsColumns = Seq("id"))
    t.append(df.coalesce(1))
    t.delete(Seq(ZonePred.between("id", "9", "10")))                 // v2
    t.update(Seq(ZonePred.eq("id", "1")), Map("v" -> lit(42.0)))     // v3
    val feed = t.readChangeFeed(2, Some(3))
      .select("id", "v", LakeTable.ChangeTypeCol, LakeTable.CommitVersionCol)
      .as[(Long, Double, String, Long)].collect().toSet
    assert(feed == Set(
      (9L, 9.0, "delete", 2L), (10L, 10.0, "delete", 2L),
      (1L, 1.0, "update_preimage", 3L), (1L, 42.0, "update_postimage", 3L)))
  }

  test("readStream refuses a table whose history contains a delete") {
    val t = ranged()
    t.delete(Seq(ZonePred.eq("id", "1")))
    val e = intercept[IllegalArgumentException] { t.readStream }
    assert(e.getMessage.contains("delete"))
  }

  test("zone maps stay consistent after a mutation: skipping read equals filter") {
    val t = ranged()
    t.delete(Seq(ZonePred.between("id", "50", "150")))
    t.update(Seq(ZonePred.between("id", "250", "260")), Map("v" -> lit(-1.0)))
    val preds = Seq(ZonePred.between("id", "240", "270"))
    val got = t.readWhere(preds).select("id", "v").as[(Long, Double)].collect().toSet
    val want = t.read.filter(col("id").between(240, 270))
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(got == want)
    // rewritten file's refreshed stats still allow pruning of other ranges
    val (_, skipped) = t.skippingStats(Seq(ZonePred.atMost("id", "40")))
    assert(skipped >= 1)
  }
}
