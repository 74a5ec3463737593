package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** DLT's `pipelines.reset.allowed = 'false'`: a whole-pipeline full refresh
 *  skips the protected table (data, once-markers and ledgers survive); an
 *  explicit refresh selection naming it refuses loudly. */
class PipelineResetSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("full refresh skips a reset-protected table; siblings rebuild; once flows don't re-drain into it") {
    val root = tmpDir("pl_reset")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "b", ts("2024-01-01 00:00:00"))).toDF("k", "v", "seq"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    // the protected append-only history: a ONCE backfill landed it
    p.streamingTable("history")
    p.tableProps("history", Map(Pipeline.ResetAllowedProp -> "false"))
    p.appendFlowStream("history", "bronze", name = "backfill", once = true)(identity)
    // an ordinary sibling that full refresh rebuilds
    p.streamingTable("silver")
    p.autoCdcFlow("silver", "bronze", Seq("k"), "seq")
    p.run()
    assert(p.read("history").count() == 2)
    val historyV = p.table("history").currentVersion

    p.runFullRefresh()
    // protected: same rows, no wipe commit, the ONCE flow did NOT re-drain
    assert(p.read("history").count() == 2)
    assert(p.table("history").currentVersion == historyV)
    // sibling rebuilt from the source's current contents
    assert(p.read("silver").count() == 2)

    // explicit selection of the protected table refuses loudly
    val e = intercept[IllegalArgumentException](p.runFullRefresh(Set("history")))
    assert(e.getMessage.contains("reset-protected"), e.getMessage)
    // ... while selecting the sibling still works
    p.runFullRefresh(Set("silver"))
    assert(p.read("silver").count() == 2)
    assert(p.read("history").count() == 2)
  }

  test("a reset-protected NON-once stream append flow does not re-land its snapshot on full refresh") {
    // the r15-advice hole: runFullRefresh skips the wipe, then run()'s
    // snapshot mode took the re-land branch (ledger >= cur → plain append
    // of the FULL source snapshot) and silently doubled the protected
    // append-only history. Protected stream flows must continue
    // incrementally in every run mode.
    val root = tmpDir("pl_reset_cont")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "b", ts("2024-01-01 00:00:00"))).toDF("k", "v", "seq"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    p.streamingTable("history")
    p.tableProps("history", Map(Pipeline.ResetAllowedProp -> "false"))
    p.appendFlowStream("history", "bronze", name = "land")(identity) // NOT once
    p.runIncremental()
    assert(p.read("history").count() == 2)

    p.runFullRefresh()                       // must NOT double to 4
    assert(p.read("history").count() == 2)

    // and the flow genuinely CONTINUES: a new source commit drains exactly
    // its delta through the kept ledger, in snapshot mode too
    bronze.append(Seq((3L, "c", ts("2024-01-02 00:00:00"))).toDF("k", "v", "seq"))
    p.run()                                  // snapshot-mode run
    assert(p.read("history").count() == 3)
    p.runFullRefresh()
    assert(p.read("history").count() == 3)
  }

  test("a reset-protected auto MV keeps its ledger and continues incrementally across a full refresh") {
    val root = tmpDir("pl_reset_mv")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq((1L, "a", 10L)).toDF("k", "g", "x"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    PipelineSql(p, """CREATE OR REFRESH MATERIALIZED VIEW panel
      TBLPROPERTIES ('pipelines.reset.allowed' = 'false')
      AS SELECT g, SUM(x) AS s, COUNT(*) AS n FROM bronze GROUP BY g""")
    p.runIncremental()
    val ledgerV = p.table("panel").lastTxnVersion("graft.aggmv.panel")
    assert(ledgerV.isDefined)
    bronze.append(Seq((2L, "a", 5L)).toDF("k", "g", "x"))
    p.runFullRefresh()                 // panel skipped by the wipe...
    // ...and its NEXT refresh ran incrementally off the kept ledger (the
    // run inside runFullRefresh already consumed the append)
    assert(p.read("panel").as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 15L, 2L)))
    assert(p.table("panel").lastTxnVersion("graft.aggmv.panel")
      .exists(v => ledgerV.forall(_ < v)))
  }
}
