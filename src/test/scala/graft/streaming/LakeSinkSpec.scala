package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** Exactly-once streaming append into a LakeTable: checkpointed restarts
 *  drain only new data; a replayed micro-batch (same epoch id) is a no-op
 *  through the transaction ledger; independent sinks interleave. */
class LakeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def land(dir: String, name: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("k", "v").coalesce(1).write.mode("append")
      .parquet(s"$dir/$name")

  test("checkpointed AvailableNow drain: restart appends only NEW files; " +
      "row totals are exact across restarts") {
    val dir = tmpDir("lakesink")
    val src = s"$dir/src"
    Files.createDirectories(Paths.get(src))
    val t = LakeTable(spark, s"$dir/t")
    t.create(Seq((0L, "")).toDF("k", "v").schema)
    land(src, "a", Seq((1L, "a"), (2L, "b")))
    val stream = () => spark.readStream
      .schema(Seq((0L, "")).toDF("k", "v").schema).parquet(s"$src/*")
    val n1 = LakeSink.appendStream(stream(), t, "sink1", s"$dir/ck")
    assert(n1 >= 1)
    assert(t.read.count() == 2)
    // second drain with nothing new: zero batches commit, zero rows move
    val n2 = LakeSink.appendStream(stream(), t, "sink1", s"$dir/ck")
    assert(n2 == 0, s"no new data must commit nothing, got $n2 batches")
    assert(t.read.count() == 2)
    // new file lands; restart from the SAME checkpoint drains only it
    land(src, "b", Seq((3L, "c")))
    val n3 = LakeSink.appendStream(stream(), t, "sink1", s"$dir/ck")
    assert(n3 >= 1)
    assert(t.read.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a replayed micro-batch (same epoch id) is a ledger no-op — the " +
      "crash-replay half of the exactly-once contract") {
    val dir = tmpDir("lakesink_replay")
    val t = LakeTable(spark, s"$dir/t")
    t.create(Seq((0L, "")).toDF("k", "v").schema)
    val batch = Seq((1L, "a")).toDF("k", "v")
    // what foreachBatch does on first delivery...
    assert(t.appendIdempotent("sinkR", 0L, batch))
    // ...and what the post-crash replay of the SAME epoch does
    assert(!t.appendIdempotent("sinkR", 0L, batch))
    assert(t.read.count() == 1)
    // the next epoch commits normally
    assert(t.appendIdempotent("sinkR", 1L, Seq((2L, "b")).toDF("k", "v")))
    assert(t.read.count() == 2)
  }

  test("two independent sinks (distinct appIds) interleave into one table " +
      "without suppressing each other's epochs") {
    val dir = tmpDir("lakesink_two")
    val t = LakeTable(spark, s"$dir/t")
    t.create(Seq((0L, "")).toDF("k", "v").schema)
    // both sinks deliver epoch 0 — per-app ledgers keep them independent
    assert(t.appendIdempotent("sinkA", 0L, Seq((1L, "a")).toDF("k", "v")))
    assert(t.appendIdempotent("sinkB", 0L, Seq((2L, "b")).toDF("k", "v")))
    assert(!t.appendIdempotent("sinkA", 0L, Seq((1L, "a")).toDF("k", "v")))
    assert(t.read.count() == 2)
  }

  test("streamed appends land through the full write path: constraints " +
      "enforced per batch, stats collected, lake readable mid-stream") {
    val dir = tmpDir("lakesink_gate")
    val src = s"$dir/src"
    Files.createDirectories(Paths.get(src))
    val t = LakeTable(spark, s"$dir/t")
    t.create(Seq((0L, "")).toDF("k", "v").schema, statsColumns = Seq("k"))
    t.addCheckConstraint("pos_k", "k > 0")
    land(src, "ok", Seq((5L, "x")))
    LakeSink.appendStream(
      spark.readStream.schema(t.schema).parquet(s"$src/*"),
      t, "sinkG", s"$dir/ck")
    assert(t.read.count() == 1)
    // a violating batch fails the query and never lands
    land(src, "bad", Seq((-1L, "boom")))
    val e = intercept[Exception] {
      LakeSink.appendStream(
        spark.readStream.schema(t.schema).parquet(s"$src/*"),
        t, "sinkG", s"$dir/ck")
    }
    assert(e.getMessage != null)
    assert(t.read.count() == 1, "the violating batch must not land")
  }
}
