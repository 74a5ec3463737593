package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/**
 * Deterministic, reproducible sampling for training-data curation. Both
 * operators are seed-free by design: membership is a pure function of the
 * row's id, so a re-run (or a backfill on another cluster) selects the SAME
 * rows — the property `Dataset.sample` (partition-order-dependent RNG)
 * cannot give.
 *
 * Scale:
 *  - [[hashSample]] is a narrow filter — no shuffle, no sort, no state. At
 *    100 TB it is the only sane default; the achieved fraction converges on
 *    num/denom by hash uniformity.
 *  - [[stratifiedExact]] guarantees an exact per-stratum row count at the
 *    cost of one hash exchange on the strata key plus a per-stratum sort.
 *    Strata skew follows data skew; for a dominant stratum prefer
 *    [[hashSample]] (or salt the window) instead.
 */
object Sampling {

  /** Keep rows where hash60(id) ≡ r (mod denom) for r < num — a ~num/denom
   *  deterministic Bernoulli sample, pure narrow filter. */
  def hashSample(df: DataFrame, idCol: String, num: Int, denom: Int): DataFrame = {
    require(num > 0 && denom > num, s"need 0 < num < denom, got $num/$denom")
    df.filter(TF.hash60(col(idCol).cast("string")) % denom < num)
  }

  /** Deterministic seeded GLOBAL SHUFFLE + fixed shard assignment — the
   *  export step of a training-data pipeline: each row's position is a
   *  seeded 60-bit hash of its id (a new seed is a fresh permutation,
   *  reproducible across runs and engines), `shard` = hash mod
   *  `numShards`, `shard_pos` = the row's 1-based hash-order position
   *  within its shard. At 100 TB this is ONE hash shuffle on the shard
   *  key with a within-partition sort — no global sort, no skew (the
   *  hash is uniform), and shard files write out independently. */
  def shuffleShards(df: DataFrame, idCol: String, seed: Long,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"need numShards > 0, got $numShards")
    val h = TF.hash60(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % numShards).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Exactly ceil(fraction · |stratum|) rows per stratum, chosen by ascending
   *  60-bit hash of the id (id tiebreak). Adds `sample_rank`, the row's
   *  1-based position in its stratum's hash order. */
  def stratifiedExact(df: DataFrame, strataCols: Seq[String], idCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0,1], got $fraction")
    val h = TF.hash60(col(idCol).cast("string"))
    val rank = Window.partitionBy(strataCols.map(col): _*).orderBy(h.asc, col(idCol).asc)
    val size = Window.partitionBy(strataCols.map(col): _*)
    df.withColumn("sample_rank", row_number().over(rank).cast("long"))
      .withColumn("__stratum_n", count(lit(1)).over(size))
      .filter(col("sample_rank") <= ceil(col("__stratum_n") * fraction))
      .drop("__stratum_n")
  }
}
