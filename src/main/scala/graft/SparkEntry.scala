package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{CoreQueries, ExtQueries, Q, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 *  The operator inventory lives in `graft.ops.*` as [[graft.ops.Q]] values;
 *  this object just flattens the registry into the driver's two maps.
 */
object SparkEntry {

  private def registry: Seq[Q] =
    CoreQueries.all ++ WindowQueries.all ++ ExtQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   *  Revenue by nation/month off the business join (SURVEY §7.7): the full
   *  silver J1 join shape feeding an A-family aggregation + sort. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val o = spark.read.parquet(s"$d/orders.parquet")
    val c = spark.read.parquet(s"$d/customer.parquet")
    val n = spark.read.parquet(s"$d/nation.parquet")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("n_name"), col("order_month"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
