package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.{TextFunctions => TF}
import graft.ops.t

/** Dev profiling harness: times the stages of a pipeline named in args(0)
  * on SPARK_GRAFT_SF_DIR. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // o33 stages (MIN/MAX retraction maintenance via extreme companions)
    if (args.headOption.contains("o33")) {
      import graft.lake.LakeTable
      import graft.pipeline.{Pipeline, PipelineSql}
      val ev = t(spark, sfDir, "events")
        .filter(col("event_type").isNotNull && col("value").isNotNull &&
          col("event_id") % 4 === 0)
        .select("event_id", "event_type", "value")
      val root = graft.ops.FixtureRoots.create("prof_o33")
      val src = LakeTable(spark, s"$root/src")
      time("o33 fixture append (CDF)") {
        src.create(ev.schema, enableChangeFeed = true); src.append(ev)
      }
      val p = new Pipeline(spark, s"$root/pipe")
      p.inputTable("src", src)
      PipelineSql(p, """CREATE OR REFRESH MATERIALIZED VIEW panel AS
        SELECT event_type, MIN(value) AS mn, MAX(value) AS mx,
               SUM(event_id) AS sid, COUNT(*) AS n
        FROM src GROUP BY event_type""")
      time("o33 bootstrap (panel + 2 companions)")(p.runIncremental())
      time("o33 delete mid-band")(
        src.deleteWhere("value >= 100.0 AND value < 105.0"))
      time("o33 refresh 2 (maintain)")(p.runIncremental())
      time("o33 delete top-band")(src.deleteWhere("value > 390.0"))
      time("o33 refresh 3 (refill/maintain)")(p.runIncremental())
      time("o33 read")(p.read("panel").orderBy("event_type").count())
      graft.ops.FixtureRoots.sweep()
      spark.stop()
      return
    }

    // g2 stages (date-partitioned fact build)
    {
      import org.apache.spark.sql.expressions.Window
      import graft.gold.{FactConfig, FactDim, GoldBuilder}
      import graft.lake.LakeTable
      val root = graft.ops.FixtureRoots.create("prof_g2")
      val dimPart = LakeTable(spark, s"$root/dim_part")
      time("g2 mint dim_part")(dimPart.overwrite(GoldBuilder.mintSurrogateKeys(
        t(spark, sfDir, "part").select("p_partkey"), Seq("p_partkey"), "dim_part_key")))
      val dimSupp = LakeTable(spark, s"$root/dim_supplier")
      time("g2 mint dim_supplier")(dimSupp.overwrite(GoldBuilder.mintSurrogateKeys(
        t(spark, sfDir, "supplier").select("s_suppkey"), Seq("s_suppkey"), "dim_supplier_key")))
      val cfg = FactConfig(s"$root/fact",
        dims = Seq(
          FactDim(dimPart, Seq("l_partkey" -> "p_partkey"), "dim_part_key"),
          FactDim(dimSupp, Seq("l_suppkey" -> "s_suppkey"), "dim_supplier_key")),
        payloadCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_shipdate", "ship_month"),
        factKeys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        cdcCol = "l_shipdate",
        partitionCol = Some("ship_month"))
      val src = t(spark, sfDir, "lineitem")
        .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      val gb = GoldBuilder(spark)
      time("g2 bootstrap build (84-partition write)")(gb.buildFact(cfg, src))
      time("g2 incremental build (pruned watermark + 1-partition merge)")(gb.buildFact(cfg, src))
      time("g2 final read+sort")(LakeTable(spark, cfg.targetPath).read
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey").count())
    }

    // s8 stages
    {
      val gb = graft.gold.GoldBuilder(spark)
      val ev = t(spark, sfDir, "events")
      val cols = Seq("user_id", "ts", "event_type", "value")
      val base = gb.latestPerKey(
        ev.filter(col("user_id") % 5 =!= 0), Seq("user_id"), "ts", Seq("event_id"))
        .select(cols.map(col): _*)
      time("s8 base latest count")(base.count())
      val tbl = graft.lake.LakeTable(spark,
        graft.ops.FixtureRoots.create("prof_s8") + "/t")
      time("s8 create+merge base")({ tbl.create(base.schema); tbl.merge(base, Seq("user_id")) })
      val src = gb.latestPerKey(
        ev.filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-20 00:00:00").cast("timestamp")),
        Seq("user_id"), "ts", Seq("event_id"))
        .withColumn("value", col("value") + lit(1000.0))
        .select(cols.map(col): _*)
      time("s8 merge src")(tbl.merge(src, Seq("user_id"), Some("s.ts >= t.ts")))
      time("s8 final read")(tbl.read.orderBy("user_id").count())
    }

    // x18 pipeline stages (60-bit simhash, 4×15-bit bands)
    {
      val docs0 = t(spark, sfDir, "documents")
      val toks = TF.tokens(TF.normalizeText(col("text")))
      val dd = docs0.select(col("doc_id"),
        graft.expressions.TextSketches.simhash(toks, 60).as("sh")).persist()
      time("x18 sketches")(dd.count())
      val bandStructs = array((0 until 4).map { j =>
        struct(lit(j).as("band"),
          shiftright(col("sh"), j * 15).bitwiseAND(lit((1L << 15) - 1)).as("bv"))
      }: _*)
      val rows = dd.select(col("doc_id"), col("sh"), explode(bandStructs).as("bk"))
        .select(col("doc_id"), col("sh"), col("bk.*"))
      val aa = rows.alias("a"); val bb = rows.alias("b")
      val joined = aa.join(bb, col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      time("x18 raw candidates")(println(s"  candidates=${joined.count()}"))
      val ham = joined.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
        .filter(col("hamming") <= 3)
      time("x18 hamming filter")(println(s"  pairs=${ham.count()}"))
      time("x18 distinct+sort")(ham.distinct().orderBy("doc_a", "doc_b").count())
      dd.unpersist()
    }

    // x17 pipeline stages
    val emb = t(spark, sfDir, "embeddings")
    val pairs = graft.ext.Similarity.nearDupPairs(emb, "vec_id", "embedding",
      64, 6, 4, minCosine = 0.4)
    val p = time("nearDupPairs materialize")(pairs.persist())
    time("nearDupPairs count")(p.count())
    val cc = time("cc build")(graft.ext.Dedup.connectedComponents(
      emb.select("vec_id"), "vec_id", p, "id_a", "id_b"))
    time("cc count")(cc.count())

    val docs = t(spark, sfDir, "documents")
    time("raw count")(docs.count())
    val sh = docs
      .select(col("doc_id"), TF.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles count")(sh.count())
    val hs = sh.select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("hs")).persist()
    time("hashes materialize")(hs.count())
    val sig = hs.select(col("doc_id"), Dedup.minhashFromHashes(col("hs"), 8).as("mh")).persist()
    time("signatures materialize")(sig.count())
    val cand = Dedup.lshCandidatePairs(sig, "doc_id", "mh", 4, 2)
    time("candidate pairs")(cand.count())
    val est = cand
      .join(sig.select(col("doc_id").as("doc_a"), col("mh").as("mha")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("mh").as("mhb")), "doc_b")
      .withColumn("est_jaccard", Dedup.signatureAgreement(col("mha"), col("mhb"), 8))
    time("estimate join")(est.count())
    graft.ops.FixtureRoots.sweep()
    spark.stop()
  }
}
