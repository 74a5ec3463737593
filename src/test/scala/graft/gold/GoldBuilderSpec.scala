package graft.gold

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.lake.LakeTable

class GoldBuilderSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2030-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2030-02-01 00:00:00")

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestPerKey keeps the newest row per key with deterministic tiebreak") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-02 00:00:00"), "b"),
      (2L, ts("2024-01-01 00:00:00"), "x"),
      (2L, ts("2024-01-01 00:00:00"), "y") // tie on seq → tiebreak desc on attr
    ).toDF("k", "seq", "attr")
    val got = GoldBuilder(spark).latestPerKey(df, Seq("k"), "seq", Seq("attr"))
      .orderBy("k").as[(Long, Timestamp, String)].collect().toSeq
    assert(got == Seq(
      (1L, ts("2024-01-02 00:00:00"), "b"),
      (2L, ts("2024-01-01 00:00:00"), "y")))
  }

  test("buildDim bootstrap: dense surrogate keys, audit columns stamped") {
    val cfg = DimConfig(s"${tmpDir("gb_boot")}/dim", Seq("k"), Seq("attr"), "cdc", "sk")
    val src = Seq(
      (30L, "c", ts("2024-01-01 00:00:00")),
      (10L, "a", ts("2024-01-02 00:00:00")),
      (20L, "b", ts("2024-01-03 00:00:00"))).toDF("k", "attr", "cdc")
    val tbl = GoldBuilder.fixed(spark, t1).buildDim(cfg, src)
    val got = tbl.read.orderBy("k")
      .select("k", "sk", "attr", "create_date", "update_date")
      .as[(Long, Long, String, Timestamp, Timestamp)].collect().toSeq
    // surrogate keys dense 1..3 in business-key order
    assert(got == Seq(
      (10L, 1L, "a", t1, t1), (20L, 2L, "b", t1, t1), (30L, 3L, "c", t1, t1)))
  }

  test("buildDim incremental: OLD rows keep surrogate+create_date, NEW mint above max") {
    val cfg = DimConfig(s"${tmpDir("gb_incr")}/dim", Seq("k"), Seq("attr"), "cdc", "sk")
    val batch1 = Seq(
      (10L, "a", ts("2024-01-01 00:00:00")),
      (20L, "b", ts("2024-01-01 00:00:00"))).toDF("k", "attr", "cdc")
    GoldBuilder.fixed(spark, t1).buildDim(cfg, batch1)
    // batch 2: update k=10, brand-new k=5
    val batch2 = Seq(
      (10L, "a2", ts("2024-02-01 00:00:00")),
      (5L, "new", ts("2024-02-01 00:00:00"))).toDF("k", "attr", "cdc")
    val tbl = GoldBuilder.fixed(spark, t2).buildDim(cfg, batch2)
    val got = tbl.read.orderBy("k")
      .select("k", "sk", "attr", "create_date", "update_date")
      .as[(Long, Long, String, Timestamp, Timestamp)].collect().toSeq
    assert(got == Seq(
      (5L, 3L, "new", t2, t2),   // new key minted above max (2)
      (10L, 1L, "a2", t1, t2),   // updated: surrogate + create kept, update restamped
      (20L, 2L, "b", t1, t1)))   // untouched
  }

  test("buildDim is idempotent: replaying the same batch leaves the dim unchanged") {
    val cfg = DimConfig(s"${tmpDir("gb_idem")}/dim", Seq("k"), Seq("attr"), "cdc", "sk")
    val src = Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("k", "attr", "cdc")
    GoldBuilder.fixed(spark, t1).buildDim(cfg, src)
    val snap1 = LakeTable(spark, cfg.targetPath).read.orderBy("k").collect().toSeq
    GoldBuilder.fixed(spark, t2).buildDim(cfg, src)
    val snap2 = LakeTable(spark, cfg.targetPath).read.orderBy("k")
      .drop("update_date").collect().toSeq
    assert(snap2 == snap1.map(r => org.apache.spark.sql.Row(r.toSeq.dropRight(1): _*)))
  }

  test("buildDim backdated refresh rewinds the watermark to reprocess old rows") {
    val cfg = DimConfig(s"${tmpDir("gb_backdate")}/dim", Seq("k"), Seq("attr"), "cdc", "sk")
    GoldBuilder.fixed(spark, t1).buildDim(cfg,
      Seq((1L, "v1", ts("2024-03-01 00:00:00"))).toDF("k", "attr", "cdc"))
    // a corrected row with an OLDER cdc value than the loaded watermark:
    // the normal incremental path ignores it...
    val correction = Seq((1L, "v1-fixed", ts("2024-02-01 00:00:00"))).toDF("k", "attr", "cdc")
    GoldBuilder.fixed(spark, t2).buildDim(cfg, correction)
    val tbl = LakeTable(spark, cfg.targetPath)
    assert(tbl.read.select("attr").as[String].head() == "v1")
    // ...a backdated refresh rewinds the watermark AND relaxes nothing else;
    // the latest-wins merge guard still applies, so the stale-sequence row
    // only lands because we also allow its cdc through the source filter —
    // reprocessing uses the same guard, demonstrating the recovery flow
    GoldBuilder.fixed(spark, t2).buildDim(cfg,
      Seq((2L, "new-old-key", ts("2024-01-15 00:00:00"))).toDF("k", "attr", "cdc"),
      backdatedRefresh = Some(ts("2024-01-01 00:00:00")))
    assert(tbl.read.count() == 2) // the pre-watermark row was processed
  }

  test("buildFact: surrogate lookup via left join; unmatched FK → null surrogate") {
    val root = tmpDir("gb_fact")
    val dim = LakeTable(spark, s"$root/dim")
    dim.overwrite(Seq((100L, 1L), (200L, 2L)).toDF("bk", "dim_key"))
    val cfg = FactConfig(s"$root/fact",
      dims = Seq(FactDim(dim, Seq("fk" -> "bk"), "dim_key")),
      payloadCols = Seq("fk", "amount", "cdc"),
      factKeys = Seq("fk"), cdcCol = "cdc")
    val fact = Seq(
      (100L, 10.0, ts("2024-01-01 00:00:00")),
      (999L, 99.0, ts("2024-01-01 00:00:00"))).toDF("fk", "amount", "cdc")
    val tbl = GoldBuilder.fixed(spark, t1).buildFact(cfg, fact)
    val got = tbl.read.orderBy("fk").select("dim_key", "fk", "amount")
      .collect().toSeq.map(r => (Option(r.get(0)), r.getLong(1), r.getDouble(2)))
    assert(got == Seq((Some(1L), 100L, 10.0), (None, 999L, 99.0)))
  }

  test("buildFact re-run merges on the grain (no duplication)") {
    val root = tmpDir("gb_fact2")
    val dim = LakeTable(spark, s"$root/dim")
    dim.overwrite(Seq((100L, 1L)).toDF("bk", "dim_key"))
    val cfg = FactConfig(s"$root/fact",
      dims = Seq(FactDim(dim, Seq("fk" -> "bk"), "dim_key")),
      payloadCols = Seq("fk", "amount", "cdc"),
      factKeys = Seq("fk"), cdcCol = "cdc")
    val fact = Seq((100L, 10.0, ts("2024-01-01 00:00:00"))).toDF("fk", "amount", "cdc")
    val gb = GoldBuilder.fixed(spark, t1)
    gb.buildFact(cfg, fact)
    gb.buildFact(cfg, fact)
    assert(LakeTable(spark, cfg.targetPath).read.count() == 1)
  }

  test("partitioned buildFact ≡ unpartitioned across an incremental 2-batch run") {
    val root = tmpDir("gb_fact_part")
    val dim = LakeTable(spark, s"$root/dim")
    dim.overwrite(Seq((100L, 1L), (200L, 2L)).toDF("bk", "dim_key"))
    def cfg(path: String, part: Option[String]) = FactConfig(s"$root/$path",
      dims = Seq(FactDim(dim, Seq("fk" -> "bk"), "dim_key")),
      payloadCols = Seq("fk", "amount", "cdc", "month"),
      factKeys = Seq("fk"), cdcCol = "cdc", partitionCol = part)
    def batch(rows: Seq[(Long, Double, String)]) =
      rows.toDF("fk", "amount", "cdc0")
        .select(col("fk"), col("amount"), col("cdc0").cast("timestamp").as("cdc"),
          date_format(col("cdc0").cast("timestamp"), "yyyy-MM").as("month"))
    val b1 = batch(Seq(
      (100L, 10.0, "2024-01-05 00:00:00"), (200L, 20.0, "2024-02-05 00:00:00")))
    // batch 2: late update to fk=200 (same max month) + new fk=300 in a new month
    val b2 = batch(Seq(
      (200L, 21.0, "2024-02-20 00:00:00"), (300L, 30.0, "2024-03-01 00:00:00")))
    val gb = GoldBuilder.fixed(spark, t1)
    val p = { gb.buildFact(cfg("fp", Some("month")), b1); gb.buildFact(cfg("fp", Some("month")), b2) }
    val u = { gb.buildFact(cfg("fu", None), b1); gb.buildFact(cfg("fu", None), b2) }
    val ps = p.read.orderBy("fk").collect().toSeq
    val us = u.read.orderBy("fk").select(p.read.columns.map(col): _*).collect().toSeq
    assert(ps == us, s"partitioned $ps != unpartitioned $us")
    assert(p.partitionColumn.contains("month"))
    // incremental watermark pruning really pruned: only the max month is read
    assert(p.ownedPartitionValues.sorted == Seq("2024-01", "2024-02", "2024-03"))
  }
}
