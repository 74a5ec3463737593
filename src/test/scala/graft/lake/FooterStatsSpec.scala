package graft.lake

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-18 optimization: per-file zone maps come from the parquet FOOTERS
 *  of the freshly written files instead of a read-back aggregation pass.
 *  These specs pin byte-parity with the old `min(col).cast("string")`
 *  encoding across every stats-column type, and that the footer path (not
 *  the silent fallback) is what produced them. */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  private def aggStats(t: LakeTable, cols: Seq[String]): Map[String, Map[String, (String, String)]] = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    t.read.groupBy(input_file_name().as("__f")).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val full = r.getString(0)
        val rel = full.substring(full.indexOf("data/"))
        rel -> cols.flatMap { c =>
          val mn = r.getAs[String](s"__mn_$c"); val mx = r.getAs[String](s"__mx_$c")
          if (mn == null || mx == null) None else Some(c -> ((mn, mx)))
        }.toMap
      }.toMap
  }

  test("footer zone stats ≡ the aggregation pass byte-for-byte across all column types") {
    val before = LakeTable.footerStatsFallbacks.get()
    val rows = Seq(
      (1L, 7, -0.5, 1.0e-7f, "alpha", Timestamp.valueOf("2024-01-01 12:00:00.123456"),
        Date.valueOf("2024-01-01"), BigDecimal("12.34"), true, Option(3.5)),
      (2L, -42, 1.0e19, 2.5f, "Ωmega", Timestamp.valueOf("2024-03-31 23:59:59"),
        Date.valueOf("2024-12-31"), BigDecimal("-0.01"), false, Option.empty[Double]),
      (3L, 0, 123456.789, -1f, "", Timestamp.valueOf("2023-06-15 00:00:00"),
        Date.valueOf("2023-01-07"), BigDecimal("99999.99"), true, Option.empty[Double]))
      .toDF("id", "i", "d", "f", "s", "ts", "dt", "dec", "b", "opt")
      .withColumn("dec", col("dec").cast("decimal(7,2)"))
    val cols = rows.columns.toSeq
    val t = LakeTable(spark, tmpDir("fstat"))
    t.create(rows.schema, statsColumns = cols)
    t.append(rows.filter(col("id") === 1L).coalesce(1))
    t.append(rows.filter(col("id") =!= 1L).coalesce(1))
    // one file carries an all-null `opt` column: it must be OMITTED from
    // that file's map exactly like the old NULL-aggregate omission
    val got = t.zoneStatsForTest
    val want = aggStats(t, cols)
    assert(got == want, s"footer stats diverge\n got=$got\nwant=$want")
    assert(got.values.exists(m => !m.contains("opt")), got)
    assert(got.values.exists(_.contains("opt")), got)
    assert(got.values.forall(_.contains("ts")), got)
    assert(LakeTable.footerStatsFallbacks.get() == before,
      "footer path silently fell back to the aggregation pass")
  }

  test("footer stats after OPTIMIZE/Z-order rewrites match the aggregation pass") {
    val before = LakeTable.footerStatsFallbacks.get()
    val t = LakeTable(spark, tmpDir("fstat_opt"))
    val mk = (r: Range) => r.map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${i % 27 + 1}%02d 06:30:00"), i * 1.5))
      .toDF("id", "ts", "v")
    t.create(mk(1 to 2).schema, statsColumns = Seq("id", "ts", "v"))
    t.append(mk(1 to 50).coalesce(1))
    t.append(mk(51 to 90).coalesce(1))
    t.compactZOrder(Seq("id"), targetFiles = 2)
    val got = t.zoneStatsForTest
    assert(got == aggStats(t, Seq("id", "ts", "v")), got)
    assert(LakeTable.footerStatsFallbacks.get() == before)
  }
}
