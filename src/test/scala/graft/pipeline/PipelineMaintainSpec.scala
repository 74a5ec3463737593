package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** DLT's scheduled MAINTENANCE update: incremental clustering for
 *  liquid-clustered pipeline tables, probe-gated bin-packing for the rest,
 *  optional vacuum — and the vacuum-safety contract: a consumer whose
 *  ledger window was vacuumed re-bootstraps instead of wedging. */
class PipelineMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def actions(df: org.apache.spark.sql.DataFrame): Map[(String, String), String] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  test("maintain: clustered tables take the incremental pass, packed tables skip, inputs stay untouched") {
    val root = tmpDir("pl_maint")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append((1L to 5000L).map(k => (k, k % 7, s"v$k")).toDF("k", "g", "v"))
    val bronzeV = bronze.currentVersion
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    p.streamingTable("silver", clusterBy = Seq("k"))
    p.autoCdcFlow("silver", "bronze", Seq("k"), "g")
    p.materializedView("gold")(p.read("silver").groupBy("g")
      .agg(count(lit(1)).as("n")))
    p.run()
    val a1 = actions(p.maintain())
    assert(a1(("silver", "optimize_clustered")).contains("clustered"), a1.toString)
    // gold just materialized as ONE overwrite — nothing to pack
    assert(a1(("gold", "optimize_compact")) == "not needed")
    // idle second pass: the clustered table is up-to-date, zero commits
    val silverV = p.table("silver").currentVersion
    val a2 = actions(p.maintain())
    assert(a2(("silver", "optimize_clustered")) == "up-to-date")
    assert(p.table("silver").currentVersion == silverV)
    // the INPUT is external: never maintained
    assert(bronze.currentVersion == bronzeV)
    assert(!a2.keys.exists(_._1 == "bronze"))
    // data intact and zone-pruned reads still correct after the pass
    assert(p.read("silver").count() == 5000)
    // event log carries the maintenance rows
    assert(p.eventLog.filter(col("event_type") === "maintenance").count() >= 4)
  }

  test("maintain packs a small-file table once, then probes cheaply") {
    val root = tmpDir("pl_maint_pack")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq((1L, "a")).toDF("k", "v"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    p.streamingTable("landed")
    p.appendFlowStream("landed", "bronze", name = "land")(identity)
    p.run()
    (2L to 6L).foreach { k =>
      bronze.append(Seq((k, s"v$k")).toDF("k", "v"))
      p.runIncremental()          // one tiny file per window
    }
    assert(p.table("landed").detail.numFiles >= 5)
    val a = actions(p.maintain())
    assert(a(("landed", "optimize_compact")).contains("packed"), a.toString)
    assert(p.table("landed").detail.numFiles == 1)
    assert(p.read("landed").count() == 6)
    assert(actions(p.maintain())(("landed", "optimize_compact")) == "not needed")
  }

  test("a vacuumed ledger window re-bootstraps the consumer instead of wedging") {
    val root = tmpDir("pl_maint_vac")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "x"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    PipelineSql(p, """CREATE OR REFRESH MATERIALIZED VIEW panel AS
      SELECT g, SUM(x) AS s, COUNT(*) AS n FROM bronze GROUP BY g""")
    p.runIncremental()                              // bootstrap, ledger @ v0
    // two appends the consumer never sees, then a pack + aggressive vacuum
    bronze.append(Seq((3L, "a", 30L)).toDF("k", "g", "x"))
    bronze.append(Seq((4L, "c", 40L)).toDF("k", "g", "x"))
    bronze.optimizeCompact()                        // drops the append dirs
    bronze.vacuum(1)                                // ...and reclaims them
    assert(!bronze.feedReadable(1, bronze.currentVersion))
    p.runIncremental()                              // MUST NOT throw
    assert(p.read("panel").orderBy("g").as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 40L, 2L), ("b", 20L, 1L), ("c", 40L, 1L)))
    // and the refresh was a recompute, visible in the event log
    val msgs = p.eventLog.filter(col("dataset") === "panel")
      .select("message").as[String].collect()
    assert(msgs.exists(_.contains("recompute")), msgs.mkString("; "))
  }

  test("maintain packs MV COMPANION tables: the distinct multiset and the " +
      "extreme top-K grow one dir per refresh and belong to no declared " +
      "dataset — maintenance must bound their file counts anyway") {
    import graft.pipeline.PipelineSql
    val root = tmpDir("pl_maint_comp")
    val bronze = LakeTable(spark, s"$root/bronze")
    bronze.append(Seq((1L, "a", 1.0)).toDF("k", "g", "v"))
    val p = new Pipeline(spark, s"$root/pipe")
    p.inputTable("bronze", bronze)
    PipelineSql(p, """CREATE OR REFRESH MATERIALIZED VIEW panel AS
      SELECT g, COUNT(DISTINCT k) AS dk, MAX(v) AS mx, COUNT(*) AS n
      FROM bronze GROUP BY g""")
    p.runIncremental()
    // 8 trickle refreshes: each merges BOTH companions → one dir each
    (2L to 9L).foreach { i =>
      bronze.append(Seq((i, "a", i.toDouble)).toDF("k", "g", "v"))
      p.runIncremental()
    }
    val dist = LakeTable(spark, s"$root/pipe/panel__dist_dk")
    val ext = LakeTable(spark, s"$root/pipe/panel__ext_mx")
    assert(dist.exists && ext.exists)
    val before = (dist.detail.numFiles, ext.detail.numFiles)
    val acts = actions(p.maintain())
    assert(acts.contains(("panel__dist_dk", "optimize_compact")), acts)
    assert(acts.contains(("panel__ext_mx", "optimize_compact")), acts)
    val after = (dist.detail.numFiles, ext.detail.numFiles)
    assert(after._1 <= 1L || after._1 < before._1,
      s"dist companion not packed: $before -> $after")
    assert(after._2 <= 1L || after._2 < before._2,
      s"ext companion not packed: $before -> $after")
    // the panels still answer exactly after the pack
    assert(p.read("panel").orderBy("g").as[(String, Long, Double, Long)]
      .collect().toSeq == Seq(("a", 9L, 9.0, 9L)))
    // and the NEXT refresh maintains against the packed companions
    bronze.append(Seq((10L, "a", 10.0)).toDF("k", "g", "v"))
    p.runIncremental()
    assert(p.read("panel").orderBy("g").as[(String, Long, Double, Long)]
      .collect().toSeq == Seq(("a", 10L, 10.0, 10L)))
  }
}
