package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The injected analyzer rule: LakeSql-registered tables resolve inside
 *  PLAIN `spark.sql` text on a session built with GraftExtensions. */
class ResolveLakeRelationsSpec extends SparkSpec {
  import spark.implicits._

  test("an extended session queries registered lake tables via plain spark.sql") {
    val t = LakeTable(spark, s"${tmpDir("resolve_e2e")}/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.deleteWhere("k = 1") // live DV: a naive path read would still see k=1
    LakeSql.register("native_t", t)
    // a SECOND session on the same SparkContext, built WITH the extension
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extended =
      try SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.expressions.GraftExtensions)
        .getOrCreate()
      finally ()
    try {
      assert(extended ne spark, "builder returned the fixture session — " +
        "the extension would not be applied")
      // plain SELECT: DV-filtered snapshot
      assert(extended.sql("SELECT count(*) AS n FROM native_t")
        .collect().head.getLong(0) == 1L)
      // time travel text resolves through the same rule
      assert(extended.sql("SELECT count(*) AS n FROM native_t VERSION AS OF 0")
        .collect().head.getLong(0) == 2L)
      // freshness: a commit between two spark.sql calls is visible
      t.append(Seq((3L, "c")).toDF("k", "v"))
      assert(extended.sql("SELECT count(*) AS n FROM native_t")
        .collect().head.getLong(0) == 2L)
      // a temp view with the same name wins (catalog precedence)
      extended.range(5).createOrReplaceTempView("native_t")
      assert(extended.sql("SELECT count(*) AS n FROM native_t")
        .collect().head.getLong(0) == 5L)
      extended.catalog.dropTempView("native_t")
      // unregistered names still fail with Spark's own error
      intercept[Exception](extended.sql("SELECT * FROM not_a_table").collect())
    } finally {
      LakeSql.unregister("native_t")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("the rule is a no-op on plans without registered relations") {
    val plan = spark.sessionState.sqlParser.parsePlan("SELECT 1 AS one")
    assert(new ResolveLakeRelations(spark)(plan) eq plan)
  }
}
