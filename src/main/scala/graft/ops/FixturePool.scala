package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

import graft.lake.LakeTable

/** Per-JVM pool of CONTENT-KEYED lake-table fixtures.
  *
  * Many registry queries materialize the same prep state before measuring
  * the operator under test — "land these events as a bronze/fact table,
  * derive a dim" — and the harness mains re-run each query several times
  * (bench = min of 3). Rebuilding that prep from parquet every run makes
  * the suite measure FIXTURE WRITES, not the refresh/merge/read under
  * test, and the cost compounds with every query added (the r16 verdict's
  * bench-headroom finding).
  *
  * The pool builds each distinct fixture ONCE per JVM under a pool root,
  * then hands queries an O(file-count) [[LakeTable.shallowClone]] into
  * their own per-query root: hard links, zero data movement, and the
  * clone is a fully independent table — the query appends, merges, and
  * rewrites its clone freely (this lake's data files are immutable; every
  * mutation writes NEW files into the clone's root) while the pooled
  * source is never touched. Per-query roots keep their self-cleaning
  * [[FixtureRoots]] contract; the pool root lives as long as the JVM and
  * a shutdown hook reclaims it, so repeated runs still leave no residue.
  *
  * Keys are caller-chosen and must uniquely describe the CONTENT,
  * including the scale-factor directory the rows came from — two call
  * sites may share a key if and only if their build closures write
  * identical tables.
  */
object FixturePool {
  private lazy val poolRoot: Path = {
    val p = Files.createTempDirectory("graft_fixture_pool")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      FixtureRoots.deleteRec(poolRoot.toFile)))
    p
  }

  /** One monitor per pool key: first builds of DIFFERENT fixtures run
    * concurrently (a parallel harness must not convoy every build behind
    * one global lock); first builds of the SAME key still serialize, so
    * concurrent first callers build once. The map itself is the only
    * globally-shared state and its access is lock-free. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The pooled table for `key`, built by `build` on first use (guarded
    * per key — concurrent first callers of one key build once; distinct
    * keys build in parallel). A build that fails PARTWAY (after its first
    * commit) is torn down before rethrowing: a half-built table must
    * never be served as the fixture for the rest of the JVM (the pre-pool
    * per-run rebuilds self-healed; the pool must too). The returned table
    * is the SHARED pool copy: callers must not mutate it — take
    * [[cloneTo]]. */
  def pooled(spark: SparkSession, key: String)
      (build: LakeTable => Unit): LakeTable = {
    require(key.matches("[A-Za-z0-9._-]+"), s"unsafe pool key: $key")
    locks.computeIfAbsent(key, _ => new Object).synchronized {
      val dir = poolRoot.resolve(key)
      val t = LakeTable(spark, dir.toString)
      if (!t.exists)
        try build(t)
        catch { case e: Throwable => FixtureRoots.deleteRec(dir.toFile); throw e }
      t
    }
  }

  /** A private, freely-mutable shallow clone of the pooled fixture at
    * `targetRoot` (typically inside the query's own [[FixtureRoots]]
    * root, so the clone's links and all its future commits are swept
    * with the query). */
  def cloneTo(spark: SparkSession, key: String, targetRoot: String)
      (build: LakeTable => Unit): LakeTable =
    pooled(spark, key)(build).shallowClone(targetRoot)
}
