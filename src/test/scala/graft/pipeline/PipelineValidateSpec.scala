package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** DLT's VALIDATE update: the whole declared graph analyzes driver-side —
 *  schemas resolve, flow column lists check against real source schemas,
 *  expectations analysis-check, cycles are graph errors — and NOTHING is
 *  written to any declared table. */
class PipelineValidateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def rows(df: org.apache.spark.sql.DataFrame): Map[(String, String), (String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getString(2), r.getString(3)))).toMap

  test("healthy medallion validates: flow targets deferred pre-run, ok after") {
    val root = tmpDir("pl_val")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq((1L, "a", ts("2024-01-01 00:00:00")))
      .toDF("k", "v", "seq"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    p.streamingView("clean", "bronze")(_.filter(col("v").isNotNull))
    p.streamingTable("silver")
    p.autoCdcFlow("silver", "clean", Seq("k"), "seq")
    p.materializedView("gold")(p.read("silver").groupBy("v")
      .agg(count(lit(1)).as("n")))
    val v = rows(p.validate())
    assert(v(("bronze", "input"))._1 == "ok")
    assert(v(("clean", "streaming_view"))._1 == "ok")
    assert(v(("clean", "streaming_view"))._2.contains("k BIGINT"))
    // silver has no defining view: its schema is minted by the flow
    assert(v(("silver", "table")) == (("deferred", "materializes at first run")))
    // gold's defining query reads silver — deferred, not an error
    assert(v(("gold", "materialized_view"))._1 == "deferred")
    assert(v(("silver", "cdc_flow"))._1 == "ok")
    // validate wrote NOTHING to the declared tables
    assert(!p.table("silver").exists && !p.table("gold").exists)
    // ... and recorded validation rows in the event log
    assert(p.eventLog.filter(col("event_type") === "validation").count() >= 5)

    p.run()
    val v2 = rows(p.validate())
    assert(v2(("silver", "table"))._1 == "ok")
    assert(v2(("silver", "table"))._2.contains("seq TIMESTAMP"))
    assert(v2(("gold", "materialized_view"))._1 == "ok")
  }

  test("a typo'd KEYS / SEQUENCE BY column is a cdc_flow error naming the column") {
    val p = new Pipeline(spark, tmpDir("pl_val_key"))
    p.view("src")(Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("k", "v", "seq"))
    p.streamingTable("t1")
    p.autoCdcFlow("t1", "src", Seq("kk"), "seq", name = "bad_keys")
    p.streamingTable("t2")
    p.autoCdcFlow("t2", "src", Seq("k"), "seqq", name = "bad_seq")
    val v = rows(p.validate())
    assert(v(("bad_keys", "cdc_flow"))._1 == "error")
    assert(v(("bad_keys", "cdc_flow"))._2.contains("kk"))
    assert(v(("bad_seq", "cdc_flow"))._2.contains("seqq"))
  }

  test("an expectation over a missing column is an expectation error, not a mid-update crash") {
    val root = tmpDir("pl_val_gate")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq((1L, "a")).toDF("k", "v"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    p.expectations("bronze", Map("typo" -> "no_such_col > 0"), Expectations.Drop)
    val v = rows(p.validate())
    assert(v(("bronze", "expectation"))._1 == "error")
    assert(v(("bronze", "expectation"))._2.contains("typo"))
  }

  test("a CDC flow cycle is a graph-level error, and an unknown source an error") {
    val p = new Pipeline(spark, tmpDir("pl_val_cycle"))
    p.streamingTable("a")
    p.streamingTable("b")
    p.autoCdcFlow("a", "b", Seq("k"), "seq")
    p.autoCdcFlow("b", "a", Seq("k"), "seq")
    val v = rows(p.validate())
    assert(v(("__graph__", "cdc_flows"))._1 == "error")
    assert(v(("__graph__", "cdc_flows"))._2.contains("cycle"))

    val p2 = new Pipeline(spark, tmpDir("pl_val_unknown"))
    p2.streamingTable("t")
    p2.autoCdcFlow("t", "nowhere", Seq("k"), "seq")
    val v2 = rows(p2.validate())
    assert(v2(("t", "cdc_flow"))._1 == "error")
    assert(v2(("t", "cdc_flow"))._2.contains("nowhere"))
  }

  test("append flows and join tables validate their transform over the source schema") {
    val root = tmpDir("pl_val_join")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("k", "v", "seq"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    p.streamingTable("landed")
    p.appendFlowStream("landed", "bronze", name = "land")(
      _.select(col("k"), col("v")))
    p.streamingTable("broken")
    p.appendFlowStream("broken", "bronze", name = "break")(
      _.select(col("k"), col("missing")))
    p.streamingJoinTable("joined", "bronze", Seq("k"), "seq")(
      df => df.withColumn("w", length(col("v"))))
    val v = rows(p.validate())
    assert(v(("land", "append_flow"))._1 == "ok")
    assert(v(("break", "append_flow"))._1 == "error")
    assert(v(("joined", "join_table"))._1 == "ok")
    assert(v(("joined", "join_table"))._2.contains("w INT"))
  }
}
