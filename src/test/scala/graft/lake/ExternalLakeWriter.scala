package graft.lake

import org.apache.spark.sql.SparkSession

/**
 * Standalone main spawned BY CrossProcessSpec as a SECOND JVM racing the
 * test's own writers against one table root. Exercises the manifest CAS
 * where it actually has to work: across OS processes on a shared
 * filesystem, where no JVM monitor or in-process lock can help — only the
 * hard-link conditional put.
 *
 * Modes:
 *  - `append <root> <id> <n>`: n single-row appends (the auto-retry commit
 *    path). Prints `EXT_DONE appended=n`.
 *  - `merge <root> <id> <n>`: n upserts of THIS writer's key with an
 *    increasing sequence number, retrying [[ConcurrentWriteException]]
 *    (merge is conditional: losers must recompute). Prints
 *    `EXT_DONE merged=n conflicts=<lost races>`.
 */
object ExternalLakeWriter {
  def main(args: Array[String]): Unit = {
    val Array(mode, root, id, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"external-lake-writer-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = LakeTable(spark, root)
    mode match {
      case "append" =>
        (0 until n).foreach { i =>
          t.append(Seq((1000L + i, s"$id-$i")).toDF("k", "v"))
        }
        println(s"EXT_DONE appended=$n")
      case "merge" =>
        var conflicts = 0
        (1 to n).foreach { seq =>
          var done = false
          while (!done) {
            try { t.merge(Seq((id, seq)).toDF("k", "seq"), Seq("k")); done = true }
            catch { case _: ConcurrentWriteException => conflicts += 1 }
          }
        }
        println(s"EXT_DONE merged=$n conflicts=$conflicts")
      case "pmerge" =>
        // n merges confined to THIS writer's partition (pt = id): with
        // partition-disjoint rebase, racing writers on different partitions
        // must all land WITHOUT ever surfacing ConcurrentWriteException
        var conflicts = 0
        (1 to n).foreach { seq =>
          var done = false
          while (!done) {
            try {
              t.merge(Seq((id, id, seq)).toDF("k", "pt", "seq"), Seq("k"))
              done = true
            } catch { case _: ConcurrentWriteException => conflicts += 1 }
          }
        }
        println(s"EXT_DONE pmerged=$n conflicts=$conflicts")
      case "props" =>
        // n property commits under this writer's namespace (the metadata
        // CAS path — commitWithRetry re-derives from the latest snapshot)
        (1 to n).foreach(i => t.setTableProperties(Map(s"$id-$i" -> i.toString)))
        println(s"EXT_DONE props=$n")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
    sys.exit(0)
  }
}
