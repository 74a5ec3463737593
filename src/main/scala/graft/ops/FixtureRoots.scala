package graft.ops

import java.nio.file.{Files, Path}

/** Registry of per-query fixture roots (temp dirs holding lake tables,
  * pipeline roots, and streaming stages that a query materializes before
  * measuring the operator under test).
  *
  * Every root a query creates is registered here, and the harness mains
  * ([[graft.Verify]], [[graft.Bench]], [[graft.Profile]]) call [[sweep]]
  * after each query's result is dumped/timed. Repeated verify/bench/test
  * runs therefore leave NO /tmp residue — the r15 profile root-caused a
  * uniform ~1.22x bench inflation to ~5,000 accumulated fixture dirs from
  * earlier runs (tmpfs pressure + directory-scan cost), which self-cleaning
  * roots make structurally impossible, on the builder's box and the
  * driver's alike.
  *
  * Thread-safe: queries may register from executor-adjacent driver threads
  * (streaming query listeners), and concurrent harnesses each sweep only
  * what was queued.
  */
object FixtureRoots {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  /** Create and register a fixture root; returns its absolute path string. */
  def create(prefix: String): String = path(prefix).toString

  /** Create and register a fixture root as a [[java.nio.file.Path]]. */
  def path(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    live.add(p)
    p
  }

  /** Recursively delete every root registered since the last sweep.
    * Safe to call while a SparkSession is live: roots are swept only after
    * the query that created them has fully materialized its result, so no
    * task holds an open handle. Deletion failures are swallowed — a busy
    * file just means the root is retried by a later sweep's registrant. */
  def sweep(): Unit = {
    var p = live.poll()
    while (p != null) {
      deleteRec(p.toFile)
      p = live.poll()
    }
  }

  private[ops] def deleteRec(f: java.io.File): Unit = {
    if (!Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRec)
    }
    f.delete(): Unit
  }
}
