package graft.ops

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

class FixturePoolSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent first callers of ONE key build once; DISTINCT keys " +
      "build in parallel (per-key monitors, no global convoy)") {
    val builds = new AtomicInteger(0)
    val bothEntered = new CountDownLatch(2)
    val pool = Executors.newFixedThreadPool(4)
    try {
      // two DISTINCT keys whose builds each wait until BOTH builds have
      // started: under the old global lock this deadlocks (the second
      // build can never start inside the first's critical section), so
      // completing within the timeout proves distinct keys don't convoy
      val distinct = (0 until 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            FixturePool.pooled(spark, s"pool_spec_par_$i") { t =>
              bothEntered.countDown()
              assert(bothEntered.await(30, TimeUnit.SECONDS),
                "distinct-key builds must overlap, not serialize")
              t.append(Seq((i.toLong, "x")).toDF("k", "v"))
            }.read.count()
        })
      }
      distinct.foreach(f => assert(f.get(60, TimeUnit.SECONDS) == 1L))
      // four concurrent first callers of the SAME key: exactly one build
      val same = (0 until 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            FixturePool.pooled(spark, "pool_spec_once") { t =>
              builds.incrementAndGet()
              t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
            }.read.count()
        })
      }
      same.foreach(f => assert(f.get(60, TimeUnit.SECONDS) == 2L))
      assert(builds.get() == 1, s"same-key build ran ${builds.get()} times")
    } finally pool.shutdownNow()
  }
}
