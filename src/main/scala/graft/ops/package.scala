package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampNTZType}

package object ops {

  /** A named, driver-checkable query: the Spark-side plan plus (when the op is
   *  SQL-expressible) the equivalent ANSI SQL the DuckDB oracle replays on the
   *  same parquet files. Output column names MUST match between the two. */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Normalize an `events.ts` column to session-zone TIMESTAMP, whatever
   *  physical encoding the driver generated it with — schema-driven, so it
   *  works on batch AND streaming frames:
   *   - parquet TIMESTAMP(NANOS) read as raw long (under
   *     `spark.sql.legacy.parquet.nanosAsLong`, set by Verify/Bench/tests):
   *     truncating long-nanos → µs division, bit-identical to DuckDB's
   *     nanos→µs truncation on the same file;
   *   - parquet TIMESTAMP(MICROS) without zone (read as TIMESTAMP_NTZ):
   *     value-preserving cast (session zone is pinned UTC everywhere);
   *   - already-zoned TIMESTAMP: untouched. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name != "ts") d
      else f.dataType match {
        case LongType => d.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => d.withColumn("ts", col("ts").cast("timestamp"))
        case _ => d
      }
    }

  /** Read one driver test table (TESTDATA.md): `$dir/<name>.parquet`,
   *  with `events.ts` re-typed via [[normalizeTs]]. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Run `body` under a temporarily reduced `spark.sql.shuffle.partitions`,
   *  restoring the prior value after. Streaming stateful operators allocate
   *  one state store PER shuffle partition (stream-stream joins allocate
   *  four), and AvailableNow drains re-commit every store each micro-batch —
   *  at correctness scale that per-store overhead dwarfs the data. Stateful
   *  queries scope themselves to a partition count sized to their key
   *  cardinality; at production scale the same knob is sized to the cluster
   *  instead (state partitioning is fixed per checkpoint, so it is a
   *  deliberate per-pipeline choice either way, not a session default).
   *
   *  NOT concurrency-safe: the setting is session-global, so a query running
   *  concurrently on the same SparkSession would observe `n` (or a clobbered
   *  restore). Bench/Verify run queries sequentially; a concurrent consumer
   *  should scope the setting to its own `spark.newSession()` instead. */
  def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // ---- cross-engine deterministic double aggregation -----------------------
  // SUM over doubles is order-dependent, so Spark and DuckDB can disagree in
  // the last ulps and fail the driver's hash compare. Summing after a cast to
  // DECIMAL is exact in both engines; casting the exact decimal result back to
  // double is then bit-identical. Every oracle-compared money/quantity
  // aggregate goes through these helpers, and the oracle SQL mirrors the same
  // casts (see `dsumSql`).

  /** Exact decimal-backed SUM surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** SQL mirror of [[dsum]] for the DuckDB oracle. */
  def dsumSql(c: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Exact decimal-backed AVG surfaced as double (sum exact, one double division). */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(lit(1)))

  def davgSql(c: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST($c AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT(*))"

  /** Exact product-of-two-factors sum: factors narrowed to DECIMAL(9,2) /
   *  DECIMAL(9,4) so products stay inside precision-38 in both engines. */
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast(DecimalType(9, 2)) * (lit(1.0) - discount).cast(DecimalType(9, 4))

  def revenueTermSql(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(9,2)) * CAST(1.0 - $discount AS DECIMAL(9,4))"
}
