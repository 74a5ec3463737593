package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

class BronzeIngestSpec extends SparkSpec {

  private def writeCsv(dir: String, name: String, lines: String*): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  test("ingests CSVs incrementally with exactly-once per file") {
    val root = tmpDir("bi_incr")
    val src = s"$root/landing"; val tbl = s"$root/bronze"; val cp = s"$root/cp"
    writeCsv(src, "batch1.csv", "id,amount", "1,10.5", "2,20.0")

    val n1 = BronzeIngest.run(spark, src, tbl, cp)
    assert(n1 == 2)

    // re-run with no new files: nothing appended (checkpoint ledger)
    val n2 = BronzeIngest.run(spark, src, tbl, cp)
    assert(n2 == 0)

    // drop a new file: only its rows land
    writeCsv(src, "batch2.csv", "id,amount", "3,30.0")
    val n3 = BronzeIngest.run(spark, src, tbl, cp)
    assert(n3 == 1)
    assert(LakeTable(spark, tbl).read.count() == 3)
  }

  test("schema is inferred once and persisted (stable across runs)") {
    val root = tmpDir("bi_schema")
    val src = s"$root/landing"; val tbl = s"$root/bronze"; val cp = s"$root/cp"
    writeCsv(src, "a.csv", "id,amount", "1,10.5")
    BronzeIngest.run(spark, src, tbl, cp)
    val s1 = BronzeIngest.loadOrInferSchema(spark, src, tbl)
    assert(s1.fieldNames.toSeq == Seq("id", "amount"))
    assert(s1("amount").dataType.typeName == "double")
    // later files can't change the persisted schema
    writeCsv(src, "b.csv", "id,amount", "x,not_a_number")
    val s2 = BronzeIngest.loadOrInferSchema(spark, src, tbl)
    assert(s2 == s1)
  }

  test("rescue mode: malformed rows land with _rescued_data instead of failing") {
    val root = tmpDir("bi_rescue")
    val src = s"$root/landing"; val tbl = s"$root/bronze"; val cp = s"$root/cp"
    writeCsv(src, "a.csv", "id,amount", "1,10.5", "2,7.25")
    BronzeIngest.run(spark, src, tbl, cp)
    // second file has an ill-typed amount → rescued, not dropped
    writeCsv(src, "b.csv", "id,amount", "3,oops")
    BronzeIngest.run(spark, src, tbl, cp)
    val bronze = LakeTable(spark, tbl).read
    assert(bronze.count() == 3)
    val rescued = bronze.filter(col(BronzeIngest.RescueCol).isNotNull).collect()
    assert(rescued.length == 1)
    assert(rescued.head.getAs[String](BronzeIngest.RescueCol).contains("oops"))
  }

  test("per-field rescue: one ill-typed cell keeps the other columns typed") {
    val root = tmpDir("bi_field_rescue")
    val src = s"$root/landing"; val tbl = s"$root/bronze"; val cp = s"$root/cp"
    writeCsv(src, "a.csv", "id,amount,qty", "1,10.5,7")
    BronzeIngest.run(spark, src, tbl, cp)
    // amount is garbage, id and qty are fine — they must stay typed
    writeCsv(src, "b.csv", "id,amount,qty", "2,not_a_number,9")
    BronzeIngest.run(spark, src, tbl, cp)
    val bronze = LakeTable(spark, tbl).read
    val bad = bronze.filter(col("id") === 2).collect().head
    assert(bad.getAs[Any]("id") == 2, "id must survive the bad amount cell")
    assert(bad.getAs[Any]("qty") == 9, "qty must survive the bad amount cell")
    assert(bad.isNullAt(bad.fieldIndex("amount")))
    val rescue = bad.getAs[String](BronzeIngest.RescueCol)
    assert(rescue.contains("\"amount\"") && rescue.contains("not_a_number"), rescue)
    assert(!rescue.contains("\"id\"") && !rescue.contains("\"qty\""),
      s"only the failed field may be rescued: $rescue")
    // clean rows carry NO rescue payload
    assert(bronze.filter(col("id") === 1)
      .filter(col(BronzeIngest.RescueCol).isNotNull).count() == 0)
  }

  test("per-field rescue: extra CSV columns rescue KEYED BY HEADER NAME") {
    val root = tmpDir("bi_extra_col")
    val src = s"$root/landing"; val tbl = s"$root/bronze"; val cp = s"$root/cp"
    writeCsv(src, "a.csv", "id,amount", "1,10.5")
    BronzeIngest.run(spark, src, tbl, cp)
    // later file grew TWO columns the persisted schema doesn't know — Auto
    // Loader keys each rescued extra by its header name
    writeCsv(src, "b.csv", "id,amount,surprise,extra2", "2,20.0,hello,w")
    BronzeIngest.run(spark, src, tbl, cp)
    val bronze = LakeTable(spark, tbl).read
    assert(bronze.columns.toSeq ==
      Seq("id", "amount", BronzeIngest.RescueCol), "schema must stay stable")
    val grown = bronze.filter(col("id") === 2).collect().head
    assert(grown.getAs[Any]("amount") == 20.0, "declared columns stay typed")
    val rescue = grown.getAs[String](BronzeIngest.RescueCol)
    assert(rescue != null &&
      rescue.contains("\"surprise\":\"hello\"") &&
      rescue.contains("\"extra2\":\"w\""),
      s"extras must be keyed by header name: $rescue")
    assert(!rescue.contains("_corrupt_record"),
      s"a header-explained row is not corrupt: $rescue")
  }

  test("rescue: divergence the file's own header cannot explain stays corrupt") {
    val root = tmpDir("bi_diverge")
    val src = s"$root/landing"; val tbl = s"$root/bronze"; val cp = s"$root/cp"
    writeCsv(src, "a.csv", "id,amount", "1,10.5")
    BronzeIngest.run(spark, src, tbl, cp)
    // header matches the schema but one DATA line grew a stray token —
    // the raw line is preserved under _corrupt_record
    writeCsv(src, "b.csv", "id,amount", "2,20.0,stray")
    BronzeIngest.run(spark, src, tbl, cp)
    val bad = LakeTable(spark, tbl).read.filter(col("id") === 2).collect().head
    val rescue = bad.getAs[String](BronzeIngest.RescueCol)
    assert(rescue != null && rescue.contains("_corrupt_record") &&
      rescue.contains("stray"), s"unexplained divergence keeps the raw line: $rescue")
  }

  test("no-op re-run skips stream startup via the landing fingerprint") {
    val root = tmpDir("bi_noop")
    val src = s"$root/landing"; val tbl = s"$root/bronze"; val cp = s"$root/cp"
    writeCsv(src, "a.csv", "id,amount", "1,10.5")
    assert(BronzeIngest.run(spark, src, tbl, cp) == 1)
    val t0 = System.nanoTime()
    assert(BronzeIngest.run(spark, src, tbl, cp) == 0)
    val noopMs = (System.nanoTime() - t0) / 1e6
    // a stream startup costs hundreds of ms; the fingerprint skip is a dir
    // listing + file read (generous bound to stay CI-safe)
    assert(noopMs < 500, s"no-op re-run took ${noopMs}ms — stream not skipped?")
    // a new file invalidates the fingerprint and still ingests
    writeCsv(src, "b.csv", "id,amount", "2,20.0")
    assert(BronzeIngest.run(spark, src, tbl, cp) == 1)
  }
}
