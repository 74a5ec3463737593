package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev measurement harness (optimization rounds; not part of the driver
  * contract): for each selected registry query, run the query function
  * once, dump the RETURNED DataFrame's `explain("formatted")` to
  * `<outDir>/<name>.txt`, and print one stats line per query —
  * wall-clock seconds plus the Spark job/stage/task counts the query
  * triggered (fixture builds, pipeline refreshes, merges AND the final
  * count). Job/stage/task counts are the scale-independent cost shape:
  * a refresh that launches 40 jobs at sf0.1 launches 40 passes at 100 TB.
  *
  *   runMain graft.Plans <outDir> [suffix] [name,name,...]
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 8).
  * `suffix` ("before"/"after") is appended to each plan file name.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r18")
    val suffix = if (args.length > 1 && args(1).nonEmpty) "_" + args(1) else ""
    val only = if (args.length > 2) Some(args(2).split(',').map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    @volatile var jobs = 0L
    @volatile var stages = 0L
    @volatile var tasks = 0L
    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.foreach { case (name, fn) =>
      jobs = 0; stages = 0; tasks = 0; shuffleWrite = 0
      val t0 = System.nanoTime()
      val res =
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          Files.write(Paths.get(outDir, s"$name$suffix.txt"),
            plan.getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
          df.count()
          "ok"
        } catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
      // settle straggler listener events before reading the counters
      Thread.sleep(300)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[plans] $name%-36s ${dt}%7.2fs jobs=$jobs%-4d stages=$stages%-5d tasks=$tasks%-6d shufKB=${shuffleWrite / 1024}%-8d $res")
      spark.catalog.clearCache()
      graft.ops.FixtureRoots.sweep()
    }
    spark.stop()
  }
}
