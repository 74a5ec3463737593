package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Idempotent transactional appends (Delta txnAppId/txnVersion): a retried
 *  job replaying the same (appId, version) must be a no-op — exactly-once
 *  ingestion with the ledger riding the manifest. */
class IdempotentWriteSpec extends SparkSpec {
  import spark.implicits._

  test("a replayed (appId, version) is a no-op; later versions land") {
    val root = s"${tmpDir("txn_basic")}/t"
    val t = LakeTable(spark, root)
    // first transaction CREATES the table — ledger present from v0
    assert(t.appendIdempotent("job-a", 1L, Seq((1L, "a")).toDF("k", "v")))
    assert(t.read.count() == 1)
    val v = t.currentVersion
    // exact replay: skipped, no version published, no rows duplicated
    assert(!t.appendIdempotent("job-a", 1L, Seq((1L, "a")).toDF("k", "v")))
    assert(t.currentVersion == v && t.read.count() == 1)
    // a LOWER version (late-arriving straggler retry) is also skipped
    assert(!t.appendIdempotent("job-a", 0L, Seq((9L, "x")).toDF("k", "v")))
    assert(t.read.count() == 1)
    // the next version lands
    assert(t.appendIdempotent("job-a", 2L, Seq((2L, "b")).toDF("k", "v")))
    assert(t.read.count() == 2)
    // other writers are independent ledger entries
    assert(t.appendIdempotent("job-b", 1L, Seq((3L, "c")).toDF("k", "v")))
    assert(t.read.count() == 3)
    // the skip leaves no orphaned data dirs behind (only committed dirs)
    val dataDirs = Files.list(Paths.get(root, "data")).count()
    assert(dataDirs == 3L, s"expected 3 committed dirs, found $dataDirs")
  }

  test("the ledger survives optimize, restore, and clone") {
    val base = tmpDir("txn_lifecycle")
    val t = LakeTable(spark, s"$base/t")
    assert(t.appendIdempotent("etl", 1L, Seq((1L, "a")).toDF("k", "v")))
    assert(t.appendIdempotent("etl", 2L, Seq((2L, "b")).toDF("k", "v")))
    t.optimizeCompact()                                     // maintenance
    assert(!t.appendIdempotent("etl", 2L, Seq((2L, "b")).toDF("k", "v")))
    t.restore(t.currentVersion - 1)                         // rollback
    // the restore preserves the CURRENT ledger: v2's transaction stays
    // applied, so the rollback cannot re-open the door to a replay
    assert(!t.appendIdempotent("etl", 2L, Seq((2L, "b")).toDF("k", "v")))
    assert(t.appendIdempotent("etl", 3L, Seq((3L, "c")).toDF("k", "v")))
    // a clone carries the ledger: the fork refuses the fork-point replays
    val c = t.shallowClone(s"$base/clone")
    assert(!c.appendIdempotent("etl", 3L, Seq((3L, "c")).toDF("k", "v")))
    assert(c.appendIdempotent("etl", 4L, Seq((4L, "d")).toDF("k", "v")))
    // the source is unaffected by the clone's ledger advance
    assert(!t.appendIdempotent("etl", 3L, Seq((9L, "x")).toDF("k", "v")))
    assert(t.read.count() == 3 && c.read.count() == 4)
  }

  test("idempotent MERGE: a replayed (appId, version) merge is a no-op even " +
      "when the merge effect itself is NOT idempotent") {
    val t = LakeTable(spark, s"${tmpDir("txn_merge")}/t")
    t.create(Seq((1L, 0L)).toDF("k", "n").schema)
    t.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "n"))
    // a counter-increment merge: replaying it would double-add
    def bump(tv: Long): Unit = t.merge(
      Seq((1L, 5L)).toDF("k", "d"), Seq("k"),
      matchedSet = Some(Map("n" -> "t.n + s.d")),
      insertAll = false, txn = Some("incr" -> tv))
    bump(1L)
    assert(t.read.filter(col("k") === 1L).select("n").as[Long].head() == 15L)
    val v = t.currentVersion
    bump(1L) // exact replay: skipped, nothing re-applied, no version minted
    assert(t.currentVersion == v)
    assert(t.read.filter(col("k") === 1L).select("n").as[Long].head() == 15L)
    bump(2L) // next version lands
    assert(t.read.filter(col("k") === 1L).select("n").as[Long].head() == 20L)
    assert(t.lastTxnVersion("incr").contains(2L))
    assert(t.lastTxnVersion("absent").isEmpty)
    // bootstrap-path merge (empty table) carries the ledger too
    val t2 = LakeTable(spark, s"${tmpDir("txn_merge2")}/t")
    t2.create(Seq((1L, 1L)).toDF("k", "n").schema)
    t2.merge(Seq((1L, 1L)).toDF("k", "n"), Seq("k"), txn = Some("boot" -> 3L))
    assert(t2.lastTxnVersion("boot").contains(3L))
    t2.merge(Seq((2L, 2L)).toDF("k", "n"), Seq("k"), txn = Some("boot" -> 3L))
    assert(t2.read.count() == 1) // replay skipped
  }

  test("recordTxn: metadata-only ledger advance — version-must-advance rule, " +
      "no data commit, invisible to the change feed") {
    val t = LakeTable(spark, s"${tmpDir("txn_record")}/t")
    t.create(Seq((1L, "a")).toDF("k", "v").schema, enableChangeFeed = true)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    assert(t.recordTxn("flow", 4L))
    assert(t.lastTxnVersion("flow").contains(4L))
    assert(!t.recordTxn("flow", 4L)) // replay: no-op, no version minted
    assert(!t.recordTxn("flow", 3L)) // regression: refused
    assert(t.lastTxnVersion("flow").contains(4L))
    assert(t.recordTxn("flow", 5L))
    // the ledger commits are metadata-only: the feed still serves exactly
    // the one appended batch
    assert(t.readChangeFeed(0L).count() == 1)
    intercept[IllegalArgumentException](t.recordTxn("", 1L))
    // clearTxn removes the entry (full-refresh primitive): the app
    // re-bootstraps — an old version is acceptable again
    assert(t.clearTxn("flow"))
    assert(!t.clearTxn("flow")) // already absent: no-op, no version minted
    assert(t.lastTxnVersion("flow").isEmpty)
    assert(t.recordTxn("flow", 2L)) // restart below the old high-water
    assert(t.lastTxnVersion("flow").contains(2L))
  }

  test("plain appends never touch the ledger; mixed use stays exactly-once") {
    val t = LakeTable(spark, s"${tmpDir("txn_mixed")}/t")
    assert(t.appendIdempotent("loader", 7L, Seq((1L, "a")).toDF("k", "v")))
    t.append(Seq((2L, "b")).toDF("k", "v")) // untracked side write
    assert(!t.appendIdempotent("loader", 7L, Seq((1L, "a")).toDF("k", "v")))
    assert(t.appendIdempotent("loader", 8L, Seq((3L, "c")).toDF("k", "v")))
    assert(t.read.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    intercept[IllegalArgumentException](
      t.appendIdempotent("", 1L, Seq((9L, "z")).toDF("k", "v")))
  }
}
