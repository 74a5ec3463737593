package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join shapes Spark has no native operator for: point-in-time (as-of) join
 * and value-band range join. Both are re-expressed as shuffle-friendly
 * equi-join/window plans — never a BroadcastNestedLoopJoin or cartesian
 * product, which is what Catalyst plans for a raw inequality join and what
 * dies first at 100 TB.
 */
object AsOf {

  /** As-of (point-in-time) join: for each left row, attach the single most
   *  recent right row with `rightTime <= leftTime` on the same `key`.
   *
   *  Formulation: tag both sides, union them on (key, time), and carry the
   *  last non-null right payload forward with a running
   *  `last(_, ignoreNulls)` window — ONE hash exchange on the key plus a
   *  per-key sort, zero row explosion. Cost scales with |left| + |right|,
   *  not |left| × |right|; a lateral/range formulation would be quadratic
   *  per key. This is the standard merge-join view of as-of, expressed
   *  declaratively so Catalyst plans one WindowExec over one Exchange.
   *
   *  Tie semantics: a right row at exactly `leftTime` IS visible
   *  (at-or-before); among right rows sharing (key, time) the greatest
   *  `tieBreak` wins — deterministic when `tieBreak` is unique per row.
   *
   *  Constraint: `payload` columns must be non-null on right rows (each is
   *  carried independently; a null payload cell would reach further back
   *  than its siblings). Left rows with no prior right row get nulls —
   *  left-outer semantics.
   */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tieBreak: String,
      payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val tbType = right.schema(tieBreak).dataType
    val lhs = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(tbType))
    val lhsPadded = payload.foldLeft(lhs) { (d, p) =>
      d.withColumn(s"$prefix$p", lit(null).cast(right.schema(p).dataType))
    }
    val rhs0 = right.select(
      col(key) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        col(tieBreak).as("__tb") +:
        payload.map(p => col(p).as(s"$prefix$p")): _*)
    val rhs = left.schema.fields.filterNot(_.name == key).foldLeft(rhs0) {
      (d, f) => d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    // Right rows sort before left rows at equal time (__side 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row.
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(lhsPadded.unionByName(rhs)) { (d, p) =>
      d.withColumn(s"$prefix$p", last(col(s"$prefix$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side", "__tb")
  }
}

object RangeJoin {

  /** Value-band range join: match each left row's `valueCol` into the band
   *  rows whose `[loCol, hiCol)` interval contains it.
   *
   *  A raw `ON v >= lo AND v < hi` join gives Catalyst no equi-key, so it
   *  plans BroadcastNestedLoopJoin — O(|left| × |bands|) comparisons and a
   *  full scan of every band per row. This bucketizes instead: each band is
   *  replicated across the fixed-width buckets its interval covers
   *  (`explode(sequence(...))`), the left side computes its bucket with one
   *  division, and the join is a plain equi-join on the bucket id with a
   *  residual exact range filter. Band replication is bounded by
   *  interval-width / `width`, so keep `width` within ~1-2 orders of
   *  magnitude of typical band widths.
   *
   *  Inner-join semantics: left rows falling in no band are dropped;
   *  overlapping bands match multiply.
   */
  def bandJoin(left: DataFrame, valueCol: String, bands: DataFrame,
      loCol: String, hiCol: String, width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val exploded = bands.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    left.withColumn("__bucket", floor(col(valueCol) / width).cast("long"))
      .join(broadcast(exploded), "__bucket")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
