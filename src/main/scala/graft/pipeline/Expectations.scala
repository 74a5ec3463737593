package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Data-quality expectations — reimplements DLT's `@dlt.expect_*` family
 * (`DLT_Silver_Pipeline/dlt_bronze_to_silver_pipeline.py:5-12`; policy menu
 * `README.md:94`) on the open `Dataset.observe` API.
 *
 * Each rule is `(name -> SQL boolean expression)`. Policies:
 *  - [[Expectations.Warn]]  — keep all rows, record violation counts (expect_all)
 *  - [[Expectations.Drop]]  — filter out rows failing ANY rule (expect_all_or_drop)
 *  - [[Expectations.Fail]]  — keep rows flowing but `assertClean` throws after
 *    the action if any violation was observed (expect_all_or_fail)
 *
 * Violation counters ride the `Observation` metric channel — a no-extra-pass,
 * executor-side aggregation, so at 100 TB the gate costs one projection, not
 * a second scan. NULL rule results count as violations (SQL three-valued
 * logic: a NULL predicate does not pass).
 */
object Expectations {
  sealed trait Policy
  case object Warn extends Policy
  case object Drop extends Policy
  case object Fail extends Policy

  final case class Gate(df: DataFrame, observation: Observation,
      rules: Map[String, String], policy: Policy = Drop) {
    /** Violation count per rule — valid after an action has run on `df`. */
    def violations: Map[String, Long] =
      rules.keys.map(n => n -> observation.get(s"violations_$n").asInstanceOf[Long]).toMap
    def passedCount: Long = observation.get("rows_passed").asInstanceOf[Long]
    /** Fail-policy check: call after the action; throws on any violation. */
    def assertClean(): Unit = {
      val bad = violations.filter(_._2 > 0)
      if (bad.nonEmpty)
        throw new IllegalStateException(s"expectations failed: $bad")
    }
  }

  def apply(df: DataFrame, rules: Map[String, String], policy: Policy): Gate = {
    val obs = Observation()
    val metricCols =
      rules.toSeq.map { case (n, e) =>
        sum(when(!coalesce(expr(e), lit(false)), 1L).otherwise(0L)).as(s"violations_$n")
      } :+ sum(when(rules.values.map(e => coalesce(expr(e), lit(false))).reduce(_ && _), 1L)
        .otherwise(0L)).as("rows_passed")
    val observed = df.observe(obs, metricCols.head, metricCols.tail: _*)
    val out = policy match {
      case Drop => observed.filter(rules.values.map(e => coalesce(expr(e), lit(false))).reduce(_ && _))
      case _ => observed
    }
    Gate(out, obs, rules, policy)
  }

  /** Pure filter form (no metrics) — the exact dataflow DLT injects for
   *  `expect_all_or_drop`; used by oracle-compared queries. */
  def dropFailed(df: DataFrame, rules: Map[String, String]): DataFrame =
    df.filter(rules.values.map(e => coalesce(expr(e), lit(false))).reduce(_ && _))

  /** Drop + CAPTURE (the quarantine pattern layered on expect_all_or_drop):
   *  passing rows continue downstream; rows failing ANY rule are returned
   *  separately, annotated with the names of the rules they failed
   *  (name-sorted, comma-joined in `_failed_rules`) for triage and replay
   *  after a fix. Both branches are narrow single-pass filters over the
   *  same source — no shuffle, no second evaluation of upstream plans
   *  beyond the shared scan. */
  def quarantine(df: DataFrame, rules: Map[String, String]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    val ordered = rules.toSeq.sortBy(_._1) // Map order is not deterministic
    val failCond = ordered.map { case (_, e) => !coalesce(expr(e), lit(false)) }
      .reduce(_ || _)
    val tags = ordered.map { case (n, e) =>
      when(!coalesce(expr(e), lit(false)), lit(n)) }
    val bad = df.filter(failCond).withColumn("_failed_rules",
      array_join(filter(array(tags: _*), c => c.isNotNull), ","))
    (dropFailed(df, rules), bad)
  }
}
