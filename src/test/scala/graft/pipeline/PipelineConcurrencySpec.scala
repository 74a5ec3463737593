package graft.pipeline

import java.sql.Timestamp
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** Wave-parallel flow execution (`Pipeline.concurrency(n)` — DLT runs
 *  independent flows concurrently): results and the event log are
 *  IDENTICAL to the sequential schedule; declared dependencies serialize;
 *  genuinely independent flows actually overlap. */
class PipelineConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def seed(root: String): (LakeTable, LakeTable) = {
    val a = LakeTable(spark, s"$root/src_a")
    a.append((1L to 400L).map(k => (k, s"a$k", ts("2024-01-01 00:00:00")))
      .toDF("k", "v", "seq"))
    val b = LakeTable(spark, s"$root/src_b")
    b.append((1L to 400L).map(k => (k, s"b$k", ts("2024-01-01 00:00:00")))
      .toDF("k", "v", "seq"))
    (a, b)
  }

  /** A two-branch medallion: two independent CDC flows + a chained select
   *  table + an auto MV per branch. */
  private def declare(p: Pipeline, a: LakeTable, b: LakeTable): Unit = {
    p.inputTable("bronze_a", a)
    p.inputTable("bronze_b", b)
    p.streamingView("clean_a", "bronze_a")(_.filter(col("v").isNotNull))
    p.streamingView("clean_b", "bronze_b")(_.filter(col("v").isNotNull))
    p.streamingTable("silver_a")
    p.streamingTable("silver_b")
    p.autoCdcFlow("silver_a", "clean_a", Seq("k"), "seq")
    p.autoCdcFlow("silver_b", "clean_b", Seq("k"), "seq")
    PipelineSql(p, """CREATE OR REFRESH MATERIALIZED VIEW gold_a AS
      SELECT v, COUNT(*) AS n, SUM(k) AS s FROM silver_a GROUP BY v""")
    PipelineSql(p, """CREATE OR REFRESH MATERIALIZED VIEW gold_b AS
      SELECT v, COUNT(*) AS n, SUM(k) AS s FROM silver_b GROUP BY v""")
  }

  test("concurrency(4) produces the same tables AND the same event log as sequential") {
    val rootSeq = tmpDir("pl_conc_seq")
    val rootPar = tmpDir("pl_conc_par")
    val (a1, b1) = seed(rootSeq)
    val (a2, b2) = seed(rootPar)
    val pSeq = new Pipeline(spark, s"$rootSeq/pipe")
    val pPar = new Pipeline(spark, s"$rootPar/pipe").concurrency(4)
    declare(pSeq, a1, b1)
    declare(pPar, a2, b2)
    pSeq.runIncremental(); pPar.runIncremental()
    a1.append(Seq((500L, "x", ts("2024-02-01 00:00:00"))).toDF("k", "v", "seq"))
    a2.append(Seq((500L, "x", ts("2024-02-01 00:00:00"))).toDF("k", "v", "seq"))
    pSeq.runIncremental(); pPar.runIncremental()
    Seq("silver_a", "silver_b", "gold_a", "gold_b").foreach { t =>
      val l = pSeq.read(t).orderBy(pSeq.read(t).columns.map(col): _*).collect().toSeq
      val r = pPar.read(t).orderBy(pPar.read(t).columns.map(col): _*).collect().toSeq
      assert(l == r, s"$t diverged under concurrency")
    }
    // event log: same events in the same ORDER (per-unit buffers append in
    // declaration order — the log is schedule-independent)
    def log(p: Pipeline) = p.eventLog
      .filter(col("event_type") === "flow_progress")
      .orderBy("run_id", "event_seq")
      .select("dataset", "rows", "message").collect().toSeq
    assert(log(pSeq) == log(pPar))
  }

  test("independent flows actually OVERLAP under concurrency(2)") {
    val root = tmpDir("pl_conc_overlap")
    val (a, b) = seed(root)
    val p = new Pipeline(spark, s"$root/pipe").concurrency(2)
    p.inputTable("bronze_a", a)
    p.inputTable("bronze_b", b)
    // both transforms must be in-flight at once to pass the latch: a
    // sequential schedule would time out (and fail the flag assertions)
    val latch = new CountDownLatch(2)
    val overlapped = new java.util.concurrent.atomic.AtomicInteger(0)
    def rendezvous(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      latch.countDown()
      if (latch.await(30, java.util.concurrent.TimeUnit.SECONDS))
        overlapped.incrementAndGet()
      df
    }
    p.streamingView("clean_a", "bronze_a")(rendezvous)
    p.streamingView("clean_b", "bronze_b")(rendezvous)
    p.streamingTable("silver_a")
    p.streamingTable("silver_b")
    p.autoCdcFlow("silver_a", "clean_a", Seq("k"), "seq")
    p.autoCdcFlow("silver_b", "clean_b", Seq("k"), "seq")
    p.runIncremental()
    assert(overlapped.get() == 2, "the two independent CDC flows never overlapped")
    assert(p.read("silver_a").count() == 400 && p.read("silver_b").count() == 400)
  }

  test("declared dependencies serialize: a chained flow waits for its upstream") {
    val root = tmpDir("pl_conc_chain")
    val (a, _) = seed(root)
    val p = new Pipeline(spark, s"$root/pipe").concurrency(4)
    p.inputTable("bronze", a)
    p.streamingTable("silver", enableChangeFeed = true)
    p.autoCdcFlow("silver", "bronze", Seq("k"), "seq")
    // chained: business sources STREAM(silver) — must see THIS run's merge
    p.streamingView("enrich", "silver")(_.withColumn("tag", lit("e")))
    p.streamingTable("business")
    p.autoCdcFlow("business", "enrich", Seq("k"), "seq")
    p.runIncremental()
    assert(p.read("business").count() == 400)
    a.append(Seq((999L, "z", ts("2024-03-01 00:00:00"))).toDF("k", "v", "seq"))
    p.runIncremental()
    // the chained flow saw the same run's upstream merge — no one-run lag
    assert(p.read("business").filter(col("k") === 999L).count() == 1)
  }

  test("a failing flow in a wave aborts the run like the sequential schedule") {
    val root = tmpDir("pl_conc_fail")
    val (a, b) = seed(root)
    val p = new Pipeline(spark, s"$root/pipe").concurrency(4)
    p.inputTable("bronze_a", a)
    p.inputTable("bronze_b", b)
    p.streamingView("clean_a", "bronze_a")(identity)
    p.streamingView("boom", "bronze_b")(
      _.select(col("k"), col("no_such_column"), col("seq")))
    p.streamingTable("silver_a")
    p.streamingTable("silver_b")
    p.autoCdcFlow("silver_a", "clean_a", Seq("k"), "seq")
    p.autoCdcFlow("silver_b", "boom", Seq("k"), "seq")
    intercept[Exception](p.runIncremental())
  }
}
