package graft.lake

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Multi-writer optimistic-concurrency protocol: distinct [[LakeTable]]
 * instances over the same root (standing in for separate processes — the
 * commit CAS is a filesystem hard link, so nothing here relies on JVM-level
 * synchronization between instances) must never lose a committed write.
 */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("racing appends from many writer instances lose no rows") {
    val root = s"${tmpDir("conc_append")}/t"
    val writers = 8
    val perWriter = 3
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val results = (0 until writers).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          val t = LakeTable(spark, root) // own instance: no shared monitor
          (0 until perWriter).foreach { i =>
            t.append(Seq((w.toLong * 100 + i, s"w$w-$i")).toDF("k", "v"))
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    results.foreach(_.get()) // surface worker exceptions
    val t = LakeTable(spark, root)
    assert(t.read.count() == writers.toLong * perWriter)
    assert(t.currentVersion == writers.toLong * perWriter - 1) // one version per append
    assert(t.history.forall(_._2 == "append"))
  }

  test("a committed version can never be stomped: losers observe the winner") {
    val root = s"${tmpDir("conc_visible")}/t"
    val a = LakeTable(spark, root)
    a.append(Seq((1L, "one")).toDF("k", "v"))
    // a second instance commits; the first instance's NEXT snapshot read
    // must see it even though `a` never wrote the version it reads
    LakeTable(spark, root).append(Seq((2L, "two")).toDF("k", "v"))
    assert(a.currentVersion == 1)
    assert(a.read.count() == 2)
    // stale _VERSION pointer cannot hide a committed version (probe-forward)
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_VERSION"),
      "0".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(a.currentVersion == 1)
    assert(LakeTable(spark, root).read.count() == 2)
  }

  test("concurrent merges on one table converge under recompute-and-retry") {
    val root = s"${tmpDir("conc_retry")}/t"
    LakeTable(spark, root).append(Seq((-1L, -1L)).toDF("k", "v"))
    val writers = 6
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val conflicts = new AtomicInteger(0)
    val futures = (0 until writers).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          val t = LakeTable(spark, root)
          val batch = Seq((w.toLong, w.toLong * 10)).toDF("k", "v")
          var attempts = 0
          var done = false
          while (!done && attempts < 50) {
            attempts += 1
            Try(t.merge(batch, Seq("k"))) match {
              case Success(_) => done = true
              case Failure(_: ConcurrentWriteException) =>
                conflicts.incrementAndGet() // recompute against new version
              case Failure(e) => throw e
            }
          }
          assert(done, s"writer $w never won in $attempts attempts")
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    futures.foreach(_.get())
    info(s"observed ${conflicts.get()} ConcurrentWriteException retries")
    val got = LakeTable(spark, root).read.orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == ((-1L, -1L) +: (0 until writers).map(w => (w.toLong, w.toLong * 10))))
  }

  test("racing schema evolutions compose: every writer's new column survives") {
    val root = s"${tmpDir("conc_evolve")}/t"
    LakeTable(spark, root).append(Seq((0L, "base")).toDF("k", "v"))
    val writers = 4
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val results = (0 until writers).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          val t = LakeTable(spark, root)
          // each writer evolves a distinct column; the commit loop must
          // re-reconcile against whatever snapshot it lands on
          t.append(
            Seq((100L + w, s"w$w", w.toDouble)).toDF("k", "v", s"extra_$w"),
            mergeSchema = true)
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    results.foreach(_.get())
    val t = LakeTable(spark, root)
    assert(t.schema.fieldNames.toSet ==
      (Set("k", "v") ++ (0 until writers).map(w => s"extra_$w")))
    assert(t.read.count() == writers.toLong + 1)
    // each row carries its own column's value, NULL in every other writer's
    val rows = t.read.filter(col("k") >= 100).collect()
    rows.foreach { r =>
      val w = r.getAs[Long]("k") - 100
      assert(r.getAs[Double](s"extra_$w") == w.toDouble)
      (0 until writers).filter(_ != w).foreach { o =>
        assert(r.isNullAt(r.fieldIndex(s"extra_$o")))
      }
    }
  }

  test("racing renames of DISTINCT columns compose; a second rename of the " +
      "SAME column fails loudly after the winner moves it") {
    val root = s"${tmpDir("conc_rename")}/t"
    LakeTable(spark, root).append(Seq((1L, "a", 1.0)).toDF("k", "v", "w"))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val results = Seq("v" -> "value", "w" -> "weight").map { case (from, to) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          LakeTable(spark, root).renameColumn(from, to)
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    results.foreach(_.get()) // both commit (commitWithRetry re-derives)
    val t = LakeTable(spark, root)
    assert(t.schema.fieldNames.toSeq == Seq("k", "value", "weight"))
    assert(t.columnMapping == Map("value" -> "v", "weight" -> "w"))
    assert(t.read.count() == 1)
    // the old name is GONE for a late writer: loud, never silent
    val e = intercept[IllegalArgumentException](t.renameColumn("v", "x"))
    assert(e.getMessage.contains("no column v"), e.getMessage)
  }
}
