package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot keys — the patterns a 100 TB deployment reaches
 * for when AQE's skew-join split isn't available or an aggregation key is
 * pathologically hot (a handful of keys owning most rows).
 *
 * Both transforms are RESULT-PRESERVING rewrites: salting only changes how
 * rows are distributed across tasks, never which rows meet or how they
 * aggregate. Deterministic outputs are guaranteed by using order-insensitive
 * aggregates (sums over decimals, counts, min/max) on top.
 */
object Skew {

  /** Per-row salt in [0, n): spreads identical keys across n reducers.
   *  Derived from a hash of the whole row, so it needs no id column and is
   *  uniform even when one key dominates. */
  def salt(n: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(n))

  /**
   * Two-phase salted aggregation: groupBy(keys :+ salt) partial-aggregates
   * into at most n·|keys| cells (bounded per-task state even when one key
   * owns billions of rows), then the final groupBy(keys) combines the n
   * cells per key. Callers supply both phases explicitly — sums combine
   * with sum, counts with sum, min with min — and keep determinism by using
   * order-insensitive aggregates (decimal sums, counts, min/max).
   */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      saltSource: Seq[String],
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", salt(saltBuckets, saltSource.map(col)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /**
   * Salted equi-join of a skew-keyed large side against a small dimension:
   * the dimension is replicated `saltBuckets`× with an explicit salt column,
   * the large side gets a row-hash salt, and the join key becomes
   * (key, salt) — so one hot key's rows spread over `saltBuckets` tasks
   * instead of one. Inner/left semantics preserved (every large-side row
   * still meets exactly its key's dimension row, once).
   */
  def saltedJoin(
      large: DataFrame,
      dim: DataFrame,
      largeKey: String,
      dimKey: String,
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      salt(saltBuckets, large.columns.map(col).toSeq))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)))).withColumn("__salt", col("__salt").cast("long"))
    saltedLarge.join(replicatedDim,
        saltedLarge(largeKey) === replicatedDim(dimKey) &&
          saltedLarge("__salt") === replicatedDim("__salt"),
        joinType)
      .drop("__salt")
  }
}
