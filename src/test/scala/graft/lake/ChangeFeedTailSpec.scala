package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactly-once change-feed tailing: poll/commit protocol, checkpointed
 *  restart, maintenance-commit skipping, rewrite refusal. */
class ChangeFeedTailSpec extends SparkSpec {
  import spark.implicits._

  private def freshCdf(name: String): (LakeTable, String) = {
    val root = tmpDir(name)
    val df = Seq((1L, "a")).toDF("k", "v")
    val t = LakeTable(spark, s"$root/t")
    t.create(df.schema, enableChangeFeed = true)
    (t, s"$root/ck")
  }

  test("poll → commit advances; an uncommitted batch is re-polled (crash replay)") {
    val (t, ck) = freshCdf("tail_basic")
    val tail = ChangeFeedTail(t, ck)
    assert(tail.poll().exists(_.changes.isEmpty)) // only the create commit
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))      // v1
    val b1 = tail.poll().get
    assert(b1.changes.get.count() == 2L && b1.toVersion == 1L)
    // no commit yet — a re-poll (the crashed-consumer path) sees the SAME range
    val b1again = tail.poll().get
    assert(b1again.fromVersion == b1.fromVersion && b1again.toVersion == 1L)
    tail.commit(1L)
    assert(tail.poll().isEmpty) // caught up
    t.merge(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k")) // v2
    val b2 = tail.poll().get
    val types = b2.changes.get.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(types == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "insert" -> 1L))
    tail.commit(b2.toVersion)
    assert(tail.poll().isEmpty)
  }

  test("a new tail instance resumes from the persisted checkpoint") {
    val (t, ck) = freshCdf("tail_restart")
    t.append(Seq((1L, "a")).toDF("k", "v"))                 // v1
    val tail1 = ChangeFeedTail(t, ck)
    tail1.commit(tail1.poll().get.toVersion)
    t.append(Seq((2L, "b")).toDF("k", "v"))                 // v2
    // fresh instance over the same checkpoint dir: sees ONLY v2's insert
    val tail2 = ChangeFeedTail(t, ck)
    assert(tail2.committedVersion == 1L)
    val b = tail2.poll().get
    assert(b.fromVersion == 2L &&
      b.changes.get.select("k").as[Long].collect().toSeq == Seq(2L))
  }

  test("maintenance commits are skipped; true rewrites refuse loudly") {
    val (t, ck) = freshCdf("tail_maint")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))      // v1
    val tail = ChangeFeedTail(t, ck)
    tail.commit(tail.poll().get.toVersion)
    t.deleteWhere("k = 1")                                   // v2: row change
    t.optimizeCompact()                                      // v3: maintenance
    t.append(Seq((3L, "c")).toDF("k", "v"))                 // v4: row change
    val b = tail.poll().get
    assert(b.toVersion == 4L)
    val types = b.changes.get.select("k", "_change_type")
      .as[(Long, String)].collect().toSet
    assert(types == Set((1L, "delete"), (3L, "insert"))) // optimize invisible
    tail.commit(b.toVersion)
    // an overwrite has no row-level delta: the tail must fail, not fabricate
    t.overwrite(Seq((9L, "z")).toDF("k", "v"))              // v5
    val e = intercept[RuntimeException](tail.poll())
    assert(e.getMessage.contains("re-bootstrap"), e.getMessage)
  }

  test("checkpoint commits are monotone and bounded by the table version") {
    val (t, ck) = freshCdf("tail_monotone")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val tail = ChangeFeedTail(t, ck)
    tail.commit(1L)
    intercept[IllegalArgumentException](tail.commit(0L)) // backwards
    intercept[IllegalArgumentException](tail.commit(9L)) // beyond table
    assert(tail.committedVersion == 1L)
  }
}
