package graft.lake

import java.nio.file.Paths
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * CROSS-PROCESS concurrency proof for the manifest CAS: a genuinely
 * separate JVM ([[ExternalLakeWriter]], spawned with this test JVM's own
 * classpath) races commits against this process on one table root. The
 * in-process ConcurrencySpec can only prove instance-level safety — the
 * commit protocol's actual claim is that the hard-link conditional put
 * serializes writers that share NOTHING but the filesystem, which is what
 * multi-cluster writers against one table path look like at 100 TB.
 */
class CrossProcessSpec extends SparkSpec {
  import spark.implicits._

  /** JDK17 module opens Spark needs when launched as a bare `java` child
   *  (mirrors build.sbt, which only covers THIS forked JVM). */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawn(mode: String, root: String, id: String, n: Int,
      log: java.io.File): Process = {
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = (Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.lake.ExternalLakeWriter", mode, root, id, n.toString))
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(log) // a file, not a pipe: no buffer deadlock
      .start()
  }

  private def finishOk(p: Process, log: java.io.File, expect: String): String = {
    assert(p.waitFor(240, TimeUnit.SECONDS), "external writer timed out")
    val out = new String(java.nio.file.Files.readAllBytes(log.toPath))
    assert(p.exitValue() == 0, out.takeRight(1500))
    assert(out.contains(expect), out.takeRight(1500))
    out
  }

  test("appends racing from a second JVM all commit, one version each") {
    val dir = tmpDir("xproc_append")
    val root = s"$dir/t"
    val n = 6
    val t = LakeTable(spark, root)
    t.create(Seq((0L, "")).toDF("k", "v").schema)
    val log = new java.io.File(s"$dir/ext.log")
    val proc = spawn("append", root, "ext", n, log)
    // race local appends while the child JVM appends
    (0 until n).foreach { i =>
      t.append(Seq((100L + i, s"local-$i")).toDF("k", "v"))
    }
    finishOk(proc, log, s"EXT_DONE appended=$n")
    // no commit lost, no commit doubled: every append owns exactly one
    // version, and every row written by either process is readable
    assert(t.read.count() == 2L * n)
    assert(t.history.count(_._2 == "append") == 2 * n)
    assert(t.currentVersion == 2L * n) // v0 create + 2n appends
    assert(t.read.filter(col("v").startsWith("ext-")).count() == n)
    assert(t.read.filter(col("v").startsWith("local-")).count() == n)
  }

  test("merges racing from a second JVM serialize or throw; no lost updates") {
    val dir = tmpDir("xproc_merge")
    val root = s"$dir/t"
    val n = 4
    val t = LakeTable(spark, root)
    t.create(Seq(("", 0)).toDF("k", "seq").schema)
    t.append(Seq(("seed", 0)).toDF("k", "seq"))
    val log = new java.io.File(s"$dir/ext.log")
    val proc = spawn("merge", root, "ext", n, log)
    // local merges retry on ConcurrentWriteException exactly like the
    // child: a merge that lost the CAS must recompute, never stomp
    var localConflicts = 0
    (1 to n).foreach { seq =>
      var done = false
      while (!done) {
        try { t.merge(Seq(("local", seq)).toDF("k", "seq"), Seq("k")); done = true }
        catch { case _: ConcurrentWriteException => localConflicts += 1 }
      }
    }
    finishOk(proc, log, s"EXT_DONE merged=$n")
    // each key carries ITS writer's final sequence — a lost update would
    // leave a stale seq; a stomped commit would lose a key
    val rows = t.read.orderBy("k").as[(String, Int)].collect().toSeq
    assert(rows == Seq(("ext", n), ("local", n), ("seed", 0)), rows.toString)
    // every committed version is one merge/append/create — the conditional
    // put never published two writers into one slot
    val h = t.history
    assert(h.map(_._1) == (0L to h.map(_._1).max), h.toString)
  }

  test("partition-DISJOINT merges racing from a second JVM all commit " +
      "without a single ConcurrentWriteException; same-partition merges " +
      "still conflict") {
    val dir = tmpDir("xproc_pmerge")
    val root = s"$dir/t"
    val n = 4
    val t = LakeTable(spark, root)
    val schema = Seq(("", "", 0)).toDF("k", "pt", "seq").schema
    t.create(schema, partitionBy = Some("pt"))
    // seed BOTH partitions sequentially so neither racer hits the
    // empty-table bootstrap path
    t.merge(Seq(("ext", "ext", 0)).toDF("k", "pt", "seq"), Seq("k"))
    t.merge(Seq(("local", "local", 0)).toDF("k", "pt", "seq"), Seq("k"))
    val log = new java.io.File(s"$dir/ext.log")
    val proc = spawn("pmerge", root, "ext", n, log)
    // local merges touch ONLY the 'local' partition: a lost CAS against the
    // child's 'ext'-partition commits must REBASE (re-point the written
    // dir), never throw — zero exceptions is the proof of no-recompute
    (1 to n).foreach { seq =>
      t.merge(Seq(("local", "local", seq)).toDF("k", "pt", "seq"), Seq("k"))
    }
    finishOk(proc, log, s"EXT_DONE pmerged=$n conflicts=0")
    val rows = t.read.orderBy("k").as[(String, String, Int)].collect().toSeq
    assert(rows == Seq(("ext", "ext", n), ("local", "local", n)), rows.toString)
    // every version slot is exactly one commit; no writer stomped another
    val h = t.history
    assert(h.map(_._1) == (0L to h.map(_._1).max), h.toString)
    assert(h.count(_._2 == "merge") == 2 * n + 2, h.toString)
    // SAME-partition rivals stay safe: rebase refuses (ownership of the
    // touched partition changed), the loser recomputes under retry, and no
    // update is lost — two instances hammer one partition's two keys
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futures = Seq("A", "B").map { key =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val w = LakeTable(spark, root)
          (1 to 3).foreach { seq =>
            var done = false
            while (!done) {
              try {
                w.merge(Seq((key, "shared", seq)).toDF("k", "pt", "seq"), Seq("k"))
                done = true
              } catch { case _: ConcurrentWriteException => () } // recompute
            }
          }
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    futures.foreach(_.get())
    val shared = t.read.filter(col("pt") === "shared")
      .orderBy("k").as[(String, String, Int)].collect().toSeq
    assert(shared == Seq(("A", "shared", 3), ("B", "shared", 3)), shared.toString)
  }

  test("property commits racing from a second JVM all land; none clobbered") {
    val dir = tmpDir("xproc_props")
    val root = s"$dir/t"
    val n = 5
    val t = LakeTable(spark, root)
    t.create(Seq((0L, "")).toDF("k", "v").schema)
    val log = new java.io.File(s"$dir/ext.log")
    val proc = spawn("props", root, "ext", n, log)
    (1 to n).foreach(i => t.setTableProperties(Map(s"local-$i" -> i.toString)))
    finishOk(proc, log, s"EXT_DONE props=$n")
    // metadata commits go through the same CAS: a racing SET that read a
    // stale property map must retry, so no writer's keys are lost
    val props = t.tableProperties
    (1 to n).foreach { i =>
      assert(props.get(s"ext-$i").contains(i.toString), props.toString)
      assert(props.get(s"local-$i").contains(i.toString), props.toString)
    }
    assert(t.history.count(_._2 == "properties") == 2 * n)
  }

  test("a rename in one process makes a stale-schema append from another " +
      "fail LOUDLY — metadata conflicts never corrupt silently") {
    val dir = tmpDir("xproc_rename")
    val root = s"$dir/t"
    val t = LakeTable(spark, root)
    t.create(Seq((0L, "")).toDF("k", "v").schema)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.renameColumn("v", "val")
    val v0 = t.currentVersion
    val log = new java.io.File(s"$dir/ext.log")
    // the child still writes the OLD logical name (k, v) — its batch must
    // be rejected by schema reconciliation, never half-committed
    val proc = spawn("append", root, "ext", 1, log)
    assert(proc.waitFor(240, TimeUnit.SECONDS), "external writer timed out")
    val out = new String(java.nio.file.Files.readAllBytes(log.toPath))
    assert(proc.exitValue() != 0, s"stale-schema append should fail: $out")
    assert(out.contains("adds column v"), out.takeRight(1500))
    // the table is untouched: same version, same rows, new name intact
    assert(t.currentVersion == v0)
    assert(t.read.columns.toSeq == Seq("k", "val"))
    assert(t.read.count() == 1)
  }
}
