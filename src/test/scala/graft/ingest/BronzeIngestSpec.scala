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

  test("per-field rescue: an extra CSV column lands in rescue") {
    val root = tmpDir("bi_extra_col")
    val src = s"$root/landing"; val tbl = s"$root/bronze"; val cp = s"$root/cp"
    writeCsv(src, "a.csv", "id,amount", "1,10.5")
    BronzeIngest.run(spark, src, tbl, cp)
    // later file grew a column the persisted schema doesn't know
    writeCsv(src, "b.csv", "id,amount,surprise", "2,20.0,hello")
    BronzeIngest.run(spark, src, tbl, cp)
    val bronze = LakeTable(spark, tbl).read
    assert(bronze.columns.toSeq ==
      Seq("id", "amount", BronzeIngest.RescueCol), "schema must stay stable")
    val grown = bronze.filter(col("id") === 2).collect().head
    assert(grown.getAs[Any]("amount") == 20.0, "declared columns stay typed")
    val rescue = grown.getAs[String](BronzeIngest.RescueCol)
    assert(rescue != null && rescue.contains("hello"), s"extra column rescued: $rescue")
  }
}
