package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.t

/**
 * Physical-plan quality gates (SURVEY.md §4): these queries must keep the
 * plan shapes that survive a 100× scale-up — filters pushed into the parquet
 * scan, dimension joins broadcast, scans column-pruned, and no accidental
 * cartesian products. A regression here is a performance bug even while
 * results stay correct.
 */
class PlanQualitySpec extends SparkSpec {

  /** Final (post-AQE) physical plan string. */
  private def planOf(df: DataFrame): String = {
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("filter on lineitem.l_shipdate is pushed to the parquet scan") {
    val df = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
      .select("l_orderkey")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
  }

  test("fact→dim left joins broadcast the dimension side") {
    val li = t(spark, sfDir, "lineitem"); val p = t(spark, sfDir, "part")
    val df = li.join(p, li("l_partkey") === p("p_partkey"), "left")
      .select("l_orderkey", "p_brand")
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("narrow projection prunes the parquet read schema") {
    val df = t(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val plan = planOf(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_extendedprice"), readSchema)
    assert(!readSchema.contains("l_returnflag"), readSchema)
  }

  test("aggregation runs partial then final (map-side combine)") {
    val df = t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = planOf(df)
    assert(plan.contains("partial_sum"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("brute-force top-k uses broadcast nested loop, never CartesianProduct") {
    val df = graft.ext.Similarity.bruteForceTopK(
      t(spark, sfDir, "embeddings"), "vec_id", "embedding",
      col("vec_id") % 100 === 0, k = 2)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("surrogate minting has no single-partition exchange and matches a global row_number") {
    import org.apache.spark.sql.expressions.Window
    val src = t(spark, sfDir, "customer").select("c_custkey", "c_name")
    val minted = graft.gold.GoldBuilder.mintSurrogateKeys(src, Seq("c_custkey"), "sk", offset = 7L)
    val plan = planOf(minted)
    assert(!plan.contains("SinglePartition"), plan)
    // distributed output: the index ride-along keeps the range partitioning
    assert(minted.rdd.getNumPartitions > 1, s"${minted.rdd.getNumPartitions} partitions")
    // bit-identical numbering vs the global-sort formulation
    val global = src.withColumn("sk",
      (row_number().over(Window.orderBy("c_custkey")) + lit(7L)).cast("long"))
    assert(minted.exceptAll(global).isEmpty && global.exceptAll(minted).isEmpty)
  }

  test("PQ scoring broadcasts the query side, never CartesianProduct") {
    val df = graft.ext.Similarity.pqTopK(
      t(spark, sfDir, "embeddings"), "vec_id", "embedding",
      col("vec_id") % 100 === 0, dim = 64, m = 8, centStride = 40, k = 2)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("LSH candidate generation is an equi-join (shuffle/broadcast hash), not a product") {
    val df = graft.ext.Similarity.lshCandidatePairs(
      t(spark, sfDir, "embeddings"), "vec_id", "embedding", 64, 6, 4)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("as-of join plans exactly one exchange (key shuffle) and one window sort") {
    val ev = t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val df = graft.ext.AsOf.asOfJoin(clicks, purchases, "user_id",
      "ts", "ts", "event_id", Seq("ts", "value"))
    // AdaptiveSparkPlan.toString prints the initial plan too — count
    // operators in the FINAL section only
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(!plan.contains("Join"), plan) // no join operator at all
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("Window"), plan)
  }

  test("corpus vocabulary top-k aggregates partially map-side and takes k without a global sort") {
    val df = t(spark, sfDir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(100)
    val plan = planOf(df)
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("GlobalSort"), plan)
  }

  test("hash sampling is a pure narrow filter over the scan") {
    val df = graft.ext.Sampling.hashSample(
      t(spark, sfDir, "documents"), "doc_id", 1, 10).select("doc_id")
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), plan)
  }

  test("x4 exact-Jaccard verify consumes LSH candidate pairs, never raw block keys") {
    val df = SparkEntry.queries("x4_dedup_jaccard_pairs")(spark, sfDir)
    val plan = planOf(df)
    // candidate generation must be the banded-minhash equi-join (band, h0, h1)
    assert(plan.contains("band"), plan)
    // ...not the round-5 quadratic self-join on coarse document attributes:
    // one (lang, source, len_band) block is billions of docs at 100 TB
    assert(!plan.contains("len_band"), plan)
    assert(!plan.contains("n_chars"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("incremental dedup probes the corpus with a broadcast of the batch bands") {
    val df = SparkEntry.queries("x41_dedup_incremental")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    // the 100 TB corpus side must never shuffle against the day's batch
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bloom-prefiltered dedup: row-local bloom probe, broadcast exact " +
      "verify, corpus never sort-merge-shuffles") {
    val df = SparkEntry.queries("x44_dedup_bloom")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    // the probe is Spark's codegen'd bloom expression, pushed as a row-local
    // Filter over the batch — not a join against the corpus
    assert(plan.contains("might_contain"), plan)
    // both joins (candidate-fp verify, match-back) broadcast the small side
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dataset card is one map-side-combined shuffle on the group keys") {
    val df = SparkEntry.queries("x47_dataset_card")(spark, sfDir)
    val plan = planOf(df)
    // partial aggregation before the exchange: the 100 TB corpus combines
    // per partition, only (source, lang) partials cross the wire
    assert(plan.contains("partial_count") || plan.contains("partial_sum"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("span dedup is one explode + balanced hash shuffles, never pairwise") {
    val df = SparkEntry.queries("x40_dup_spans")(spark, sfDir)
    val plan = planOf(df)
    // the duplicated-span check is a group-by on the span hash — any
    // cartesian/pairwise shape here would be quadratic at corpus scale
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("semantic pruning broadcasts centroids; pairwise work stays within cells") {
    val df = SparkEntry.queries("x42_semantic_prune")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    // quantizer assignment must broadcast the (tiny) centroid side, and the
    // only pair join is the cell equi-join — never an all-pairs product
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("LM-quality df aggregation runs partial then final (map-side combine)") {
    val df = SparkEntry.queries("x43_lm_quality")(spark, sfDir)
    val plan = planOf(df)
    // token df and the per-doc sums must combine map-side: the token stream
    // is the corpus itself at 100 TB
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("decontamination probes the corpus with a broadcast of the eval shingles") {
    val df = SparkEntry.queries("x28_decontaminate")(spark, sfDir)
    val plan = planOf(df)
    // the 100 TB training side must never shuffle against the tiny eval set
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("deletion-vector reads broadcast the vector anti-join; never sort-merge") {
    val df = SparkEntry.queries("s17_delete_mor")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    // the scan side is the (100 TB) table; the vector side is sized by
    // deleted rows — it must broadcast, and the scan must never sort for it
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("fuzzy decontamination broadcasts banded eval signatures; corpus never shuffles pre-join") {
    val df = SparkEntry.queries("x35_decontaminate_fuzzy")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    // the 100 TB training side probes a broadcast of the (tiny) banded eval
    // side — a sort-merge or cartesian here is a scale killer
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // one combined sketch kernel per side — the signature and the
    // verification set must NOT be computed by two separate md5 passes
    assert("shingle_sketch".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("minhash_signature"), plan)
  }

  test("sequence packing exchanges once on the source key (plus the output sort)") {
    val df = SparkEntry.queries("x29_pack_sequences")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("Window"), plan)
  }

  test("mixture sampling broadcasts the per-source targets back to the corpus") {
    val df = SparkEntry.queries("x30_mixture_sample")(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  // whole-stage codegen renders as a `*(n)` stage prefix in executedPlan
  test("regex token counting and punct ratio stay inside whole-stage codegen") {
    val df = t(spark, sfDir, "documents").select(
      col("doc_id"),
      graft.functions.TextFunctions.bpeishTokenCount(col("text")).as("n"),
      graft.functions.TextFunctions.punctRatio(col("text")).as("p"))
    val plan = planOf(df)
    assert(plan.contains("*(1) Project"), plan)
  }

  test("native sketch kernels participate in whole-stage codegen") {
    val df = t(spark, sfDir, "documents").select(
      graft.expressions.TextSketches.shingleHashSet(
        graft.functions.TextFunctions.tokens(col("text")), 3).as("sh"))
    val plan = planOf(df)
    assert(plan.contains("*(1) Project"), plan)
  }

  test("SQL-text SELECT pushes its WHERE into the snapshot's parquet scan") {
    val df = SparkEntry.queries("s25_sql_select")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    // the substituted snapshot is ordinary parquet relations underneath, so
    // Catalyst must push the SELECT's predicate into every file scan (incl.
    // the pre-evolution files) — at 100 TB an unpushed filter re-reads the
    // table — and the live-DV anti-join must broadcast, never sort-merge
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThanOrEqual(o_totalprice"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("hot-cell-capped pairs broadcast the oversized-cell census") {
    val emb = t(spark, sfDir, "embeddings")
    val assigned = graft.ext.Similarity.ivfCells(emb, "vec_id", "embedding",
      centStride = 100, kmeansIters = 1)
    val df = graft.ext.Similarity.cellCappedPairs(assigned, "vec_id", 1000)
    val plan = planOf(df)
    // the per-cell census is O(#cells) rows: it must ride a broadcast back
    // onto the corpus, never shuffle the corpus against it
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("IVF quantizer is single-compute: the refined centroid set is a local " +
      "relation, and the final plan scans the corpus exactly twice") {
    val df = SparkEntry.queries("x13_sim_ivf_topk")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    // the quantizer (stride seed + Lloyd refinement) runs ONCE, eagerly, and
    // lands as a broadcast-able LocalTableScan — corpus assignment and the
    // query probe must NOT each re-run the refinement subtree (at 100 TB
    // that recompute multiplies whole-corpus passes)
    assert(plan.contains("LocalTableScan"), plan)
    val corpusScans = "Scan parquet".r.findAllIn(plan).size
    assert(corpusScans <= 2, s"expected <=2 corpus scans, got $corpusScans\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("scd2Apply rides ONE keys exchange end-to-end — no (key, seq) or (key, version) re-shuffles") {
    val gb = graft.gold.GoldBuilder(spark)
    val ev = t(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select("user_id", "ts", "event_type", "value")
    // bootstrap arm: dedup, RLE and version grouping all share the keys
    // partitioning — exactly one hash exchange in the whole apply
    val boot = gb.scd2Apply(ev, None, Seq("user_id"), "ts", Seq("event_type", "value"))
    val bplan = planOf(boot).split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(bplan).size == 1, bplan)
    // incremental arm (open rows present): the batch may join/union, but no
    // exchange may re-partition by the sequence column or the version label
    // (the pre-round-18 plan shuffled the batch by (user_id, ts) for dedup
    // and by (user_id, __vstart) for version grouping)
    import java.sql.Timestamp
    val target = spark.createDataFrame(Seq(
      (1L, "click", 1.0, Timestamp.valueOf("2024-01-01 00:00:00"),
        null.asInstanceOf[Timestamp]))).toDF(
      "user_id", "event_type", "value", graft.gold.GoldBuilder.Scd2Start,
      graft.gold.GoldBuilder.Scd2End)
    for (ignoreNulls <- Seq(false, true)) {
      val inc = gb.scd2Apply(ev, Some(target), Seq("user_id"), "ts",
        Seq("event_type", "value"), trackCols = Some(Seq("event_type")),
        ignoreNulls = ignoreNulls)
      val plan = planOf(inc).split("== Initial Plan ==").head
      val badParts = "hashpartitioning\\([^)]*(\\bts#|__vstart|__g#)".r
      assert(badParts.findFirstIn(plan).isEmpty,
        s"ignoreNulls=$ignoreNulls: seq/version/group re-shuffle present\n$plan")
    }
  }

  test("custom-state sessionization plans the arbitrary-state operator, one key shuffle") {
    val df = SparkEntry.queries("w_custom_state")(spark, sfDir)
    val plan = planOf(df).split("== Initial Plan ==").head
    // batch planning lowers flatMapGroupsWithState to MapGroupsExec (state is
    // per-invocation); streaming would plan FlatMapGroupsWithStateExec
    assert(plan.contains("MapGroups"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
