package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Embedding-vector Column library (`ARRAY<FLOAT>` columns) built on Spark's
 * native higher-order functions — `zip_with` for the elementwise product,
 * `aggregate` for the sequential sum — so no UDF leaves the engine and the
 * evaluation order is deterministic left-to-right (bit-identical across
 * engines computing the same double sequence; required for oracle parity).
 *
 * Scale notes: these are O(dim) per row projections. The quadratic part of
 * similarity work is controlled by the *callers* (LSH bucketing / blocked
 * join in graft.ext.Similarity), never here.
 */
object VectorFunctions {

  /** Cast a float array to double once, up front — all arithmetic is then
   *  double-exact and portable. */
  def toDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Sequential dot product of two float/double arrays — the native codegen
   *  expression ([[graft.expressions.VectorDot]]); bit-identical to the
   *  higher-order fold [[dotHof]] (and to DuckDB's `list_dot_product`), just
   *  compiled to a primitive loop. */
  def dot(a: Column, b: Column): Column = graft.expressions.VectorDot.dot(a, b)

  /** Interpreted higher-order-function formulation of [[dot]] — kept as the
   *  executable specification the native expression is tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float/double-array columns — the native dot
   *  widens floats exactly, so no up-front cast is needed. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /**
   * Deterministic signed-random-projection LSH bucket for a float vector:
   * `nBits` integer-weight hyperplanes with weights
   * `w(i,j) = ((1103515245*(i*dim+j) + 12345) / 65536) % 7 - 3`
   * (an LCG over the plane/coordinate index — pure 64-bit integer math, so
   * any engine reproduces the exact same planes). Bucket = sign-bit pattern.
   *
   * Vectors in the same bucket are "probably close" (cosine-LSH property:
   * P[sign match] = 1 - angle/π per plane); candidate generation joins on the
   * bucket key, turning the O(n²) similarity join into O(n) + per-bucket work.
   */
  def lshBucket(vF: Column, dim: Int, nBits: Int, seed: Int = 0): Column = {
    val bits = (0 until nBits).map { i =>
      // plane as a literal array → tiny expression tree (the unrolled
      // per-coordinate form blew up codegen), dot as the same sequential
      // fold the oracle's list_dot_product performs (native expression
      // widens float elements exactly, so no explicit toDouble needed).
      val w = array((0 until dim).map(j =>
        lit(planeWeight(seed + i, j, dim).toDouble)): _*)
      when(dot(vF, w) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).cast(LongType)
  }

  /** SQL mirror of [[lshBucket]] for the DuckDB oracle. `vExpr` must already
    * be a DOUBLE[] expression (mirror of [[toDouble]]). */
  def lshBucketSql(vExpr: String, dim: Int, nBits: Int, seed: Int = 0): String = {
    val bits = (0 until nBits).map { i =>
      val w = (0 until dim).map(j => s"${planeWeight(seed + i, j, dim)}.0").mkString(", ")
      s"CASE WHEN list_dot_product($vExpr, [$w]::DOUBLE[]) >= 0 THEN ${1L << i} ELSE 0 END"
    }
    s"CAST(${bits.mkString(" + ")} AS BIGINT)"
  }

  /** Integer hyperplane weight for plane `p`, coordinate `j` — the shared
   *  LCG both the Column and SQL forms derive planes from. */
  private def planeWeight(p: Int, j: Int, dim: Int): Long =
    ((1103515245L * (p.toLong * dim + j) + 12345L) / 65536L) % 7L - 3L
}
