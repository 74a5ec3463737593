package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class LakeTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): LakeTable =
    LakeTable(spark, s"${tmpDir(name)}/t")

  test("create + read empty table preserves schema") {
    val t = freshTable("lt_create")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    t.create(schema)
    assert(t.exists)
    assert(t.read.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(t.read.count() == 0)
  }

  test("append is additive and versioned") {
    val t = freshTable("lt_append")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v1 = t.currentVersion
    t.append(Seq((3L, "c")).toDF("k", "v"))
    assert(t.currentVersion == v1 + 1)
    assert(t.read.count() == 3)
    assert(t.read.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("overwrite replaces the snapshot") {
    val t = freshTable("lt_overwrite")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.overwrite(Seq((9L, "z")).toDF("k", "v"))
    assert(t.read.as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("merge: update-all / insert-all / keep semantics") {
    val t = freshTable("lt_merge")
    t.overwrite(Seq((1L, "old1", 10), (2L, "old2", 20)).toDF("k", "v", "seq"))
    // k=1 matched (update), k=3 unmatched (insert); k=2 untouched (keep)
    t.merge(Seq((1L, "new1", 11), (3L, "new3", 30)).toDF("k", "v", "seq"), Seq("k"))
    val got = t.read.orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "new1", 11), (2L, "old2", 20), (3L, "new3", 30)))
  }

  test("merge guard: stale source rows lose (latest-wins)") {
    val t = freshTable("lt_guard")
    t.overwrite(Seq((1L, "cur", 100), (2L, "cur", 100)).toDF("k", "v", "seq"))
    t.merge(Seq((1L, "stale", 50), (2L, "newer", 150)).toDF("k", "v", "seq"),
      Seq("k"), Some("s.seq >= t.seq"))
    val got = t.read.orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "cur", 100), (2L, "newer", 150)))
  }

  test("merge is idempotent: replaying the same source changes nothing") {
    val t = freshTable("lt_idem")
    val src = Seq((1L, "a", 1), (2L, "b", 2)).toDF("k", "v", "seq")
    t.create(src.schema)
    t.merge(src, Seq("k"), Some("s.seq >= t.seq"))
    val snap1 = t.read.orderBy("k").collect().toSeq
    t.merge(src, Seq("k"), Some("s.seq >= t.seq"))
    assert(t.read.orderBy("k").collect().toSeq == snap1)
  }

  test("merge on composite keys") {
    val t = freshTable("lt_composite")
    t.overwrite(Seq((1L, "x", "a"), (1L, "y", "b")).toDF("k1", "k2", "v"))
    t.merge(Seq((1L, "y", "B"), (2L, "z", "c")).toDF("k1", "k2", "v"), Seq("k1", "k2"))
    val got = t.read.orderBy("k1", "k2").as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "x", "a"), (1L, "y", "B"), (2L, "z", "c")))
  }

  test("merge rejects mismatched schema and duplicate source keys") {
    val t = freshTable("lt_reject")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      t.merge(Seq((1L, "a", 1)).toDF("k", "v", "extra"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      t.merge(Seq((1L, "a"), (1L, "b")).toDF("k", "v"), Seq("k"),
        checkUniqueKeys = true)
    }
  }

  test("readers see a consistent snapshot; vacuum drops old versions' files") {
    val t = freshTable("lt_vacuum")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    val oldSnapshot = t.read // plan bound to v0 file list
    t.overwrite(Seq((2L, "b")).toDF("k", "v"))
    assert(oldSnapshot.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    t.overwrite(Seq((3L, "c")).toDF("k", "v"))
    t.vacuum(keepVersions = 1)
    assert(t.read.as[(Long, String)].collect().toSeq == Seq((3L, "c")))
  }

  test("readVersion time-travels to any retained snapshot") {
    val t = freshTable("lt_timetravel")
    t.append(Seq((1L, "a")).toDF("k", "v"))              // v0: append
    t.append(Seq((2L, "b")).toDF("k", "v"))              // v1: append
    t.merge(Seq((2L, "b2")).toDF("k", "v"), Seq("k"))    // v2: merge update
    assert(t.readVersion(0).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(t.readVersion(1).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(t.readVersion(2).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b2")))
    assert(t.history.map(_._2) == Seq("append", "append", "merge"))
    assertThrows[IllegalArgumentException](t.readVersion(3))
  }

  test("readVersion of a vacuumed version fails loudly, not partially") {
    val t = freshTable("lt_tt_vacuum")
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))           // v0
    t.overwrite(Seq((2L, "b")).toDF("k", "v"))           // v1
    t.overwrite(Seq((3L, "c")).toDF("k", "v"))           // v2
    t.vacuum(keepVersions = 1)
    val e = intercept[IllegalArgumentException](t.readVersion(0))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    assert(t.readVersion(2).as[(Long, String)].collect().toSeq == Seq((3L, "c")))
  }

  test("readStream refuses a table whose history has non-append commits") {
    val t = freshTable("lt_stream_guard")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.merge(Seq((1L, "a2")).toDF("k", "v"), Seq("k"))
    val e = intercept[IllegalArgumentException](t.readStream)
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }

  test("merge with null-valued non-key columns round-trips") {
    val t = freshTable("lt_nulls")
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null), Row(2L, "x"))), schema)
    t.create(schema)
    t.merge(rows, Seq("k"))
    assert(t.read.filter(col("v").isNull).count() == 1)
  }
}
