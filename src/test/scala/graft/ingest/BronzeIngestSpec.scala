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
}
