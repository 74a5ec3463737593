package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.ops.t

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  test("native dot is bit-identical to the higher-order fold on real embeddings") {
    val emb = t(spark, sfDir, "embeddings")
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")),
        col("a_id") < col("b_id") && col("a_id") < 20 && col("b_id") < 20)
    val diff = pairs.select(
      (VectorFunctions.dot(col("a"), col("b")) =!=
        VectorFunctions.dotHof(VectorFunctions.toDouble(col("a")),
          VectorFunctions.toDouble(col("b")))).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("double arrays, float/double mix, and empty arrays") {
    val df = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head() == 13.0)
    val mixed = Seq((Array(1.5f, 2.5f), Array(2.0, 4.0))).toDF("a", "b")
    assert(mixed.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head() == 13.0)
    val empty = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    assert(empty.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head() == 0.0)
  }

  test("null array or null element → null result (HOF parity)") {
    val df = Seq(
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))),
      (None, Some(Seq(Some(1.0f))))).toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(None, None))
  }

  test("many dots in one generated function compile (no local-name collision)") {
    // Regression for the fixed-local-name codegen bug: lshBucket puts 6 dots
    // per band and cosine composes 3 in ONE generated function; with fixed
    // `int i` locals janino rejected the function and Spark silently fell
    // back to interpreted mode. CODEGEN_ONLY + fallback=false make any
    // compile failure throw instead of degrading.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val emb = t(spark, sfDir, "embeddings").limit(20)
      val dim = emb.select(size(col("embedding"))).as[Int].head()
      val df = emb.select(
        VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"),
        VectorFunctions.lshBucket(col("embedding"), dim, 8).as("bucket"))
      assert(df.collect().length == 20)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("participates in whole-stage codegen") {
    val emb = t(spark, sfDir, "embeddings")
    val df = emb.select(VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
    df.collect()
    // the "*(n)" prefix marks WholeStageCodegen spans in the plan rendering
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("vector_dot"), plan)
  }

  test("dots over NON-NULLABLE arrays stay compiled (IVF refinement shape)") {
    // Regression: collect_list output is a non-nullable array column; the
    // expression then reported nullable=false while its codegen assigned
    // `ev.isNull = true` — a slot that does not exist — so janino rejected
    // the function and EVERY operator containing a dot over non-nullable
    // arrays (the whole IVF centroid-assignment join) silently ran
    // interpreted. fallback=false makes any compile failure throw.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1L, 2.0), (1L, 3.0), (2L, 4.0)).toDF("id", "x")
        .groupBy("id").agg(collect_list(col("x")).as("cv"))
        .withColumn("d", VectorFunctions.dot(col("cv"), col("cv")))
      // non-nullable arrays of non-nullable elements → non-nullable result,
      // branch-free generated loop
      assert(!df.schema("d").nullable)
      val got = df.orderBy("id").select("d").as[Double].collect().toSeq
      assert(got == Seq(13.0, 16.0)) // 4+9, 16
      // null ELEMENTS still null the result — and flip nullability on
      val withNulls = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)))
        .toDF("a", "b").withColumn("d", VectorFunctions.dot(col("a"), col("b")))
      assert(withNulls.schema("d").nullable)
      assert(withNulls.select("d").collect().head.isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
  }
}
