package graft.lake

import java.util.Locale

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction}

/**
 * SQL-TEXT DML surface for lake tables: `MERGE INTO ... USING ... ON ...
 * WHEN MATCHED [AND guard] THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
 * executed against a registered [[LakeTable]] — the statement form the
 * reference's gold notebooks run (`DIM_Gold_layer.py:176-195` drives its
 * upserts through `spark.sql(merge_sql)` on Delta).
 *
 * Spark's OWN parser produces the `MergeIntoTable` logical plan; this layer
 * only WALKS it — target name → registry lookup, `USING` plan → analyzed
 * DataFrame (temp views and subqueries resolve through Spark's analyzer),
 * ON-conjunction → equi-join keys, matched guard → re-qualified `s`/`t`
 * expression — and hands off to [[LakeTable.merge]]. No Catalyst surgery:
 * resolution rules, analyzer, and the merge engine stay untouched.
 *
 * Supported statement shape (exactly the reference's):
 *   - ON: conjunction of `t.k = s.k` equalities over SAME-named columns
 *   - WHEN MATCHED [AND <guard>] THEN UPDATE SET *   (at most one)
 *   - WHEN NOT MATCHED THEN INSERT *                 (unconditioned)
 * Anything else — DELETE clauses, column-level assignments, NOT MATCHED BY
 * SOURCE — fails loudly with the offending clause named.
 */
object LakeSql {

  private val tables =
    scala.collection.concurrent.TrieMap.empty[String, LakeTable]

  private def norm(name: String): String = name.toLowerCase(Locale.ROOT)

  /** Register `table` under `name` for SQL-text statements. */
  def register(name: String, table: LakeTable): Unit =
    tables.put(norm(name), table)

  def unregister(name: String): Unit = { tables.remove(norm(name)); () }

  /** Parse and execute a `MERGE INTO` statement against registered lake
   *  tables. Returns the target table (for chaining reads). */
  def merge(spark: SparkSession, sqlText: String): LakeTable = {
    val plan = spark.sessionState.sqlParser.parsePlan(sqlText)
    val m = plan match {
      case mit: MergeIntoTable => mit
      case other => throw new IllegalArgumentException(
        s"LakeSql.merge expects a MERGE INTO statement, got ${other.nodeName}")
    }
    val (targetName, targetAlias) = relationOf(m.targetTable, "target")
    val target = tables.getOrElse(norm(targetName), throw new IllegalArgumentException(
      s"no lake table registered as '$targetName' — LakeSql.register it first"))
    val (sourceDf, sourceAlias) = sourceOf(spark, m.sourceTable)
    require(norm(targetAlias) != norm(sourceAlias),
      s"target and source aliases must differ (both are '$targetAlias') — " +
        "equiKeys cannot tell the sides apart and guard requalification would misbind")

    val keys = equiKeys(m.mergeCondition, targetAlias, sourceAlias)

    require(m.notMatchedBySourceActions.isEmpty,
      "WHEN NOT MATCHED BY SOURCE is not supported (the engine merge keeps target-only rows)")
    val guard = m.matchedActions match {
      case Nil => None
      case Seq(UpdateStarAction(cond)) =>
        cond.map(c => requalify(c, targetAlias, sourceAlias).sql)
      case other => throw new IllegalArgumentException(
        s"only a single WHEN MATCHED THEN UPDATE SET * clause is supported, got: " +
          other.map(_.getClass.getSimpleName).mkString(", "))
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case other => throw new IllegalArgumentException(
        "exactly one unconditioned WHEN NOT MATCHED THEN INSERT * clause is required, got: " +
          (if (other.isEmpty) "none" else other.map(_.getClass.getSimpleName).mkString(", ")))
    }
    // when no UPDATE clause exists, matched rows keep the target version:
    // guard `false` never takes the source side for matches
    target.merge(sourceDf, keys, if (m.matchedActions.isEmpty) Some("false") else guard)
    target
  }

  /** Relation name + alias (alias defaults to the last name part). */
  private def relationOf(plan: LogicalPlan, side: String): (String, String) = plan match {
    case SubqueryAlias(ident, UnresolvedRelation(parts, _, _)) =>
      (parts.mkString("."), ident.name)
    case UnresolvedRelation(parts, _, _) => (parts.mkString("."), parts.last)
    case other => throw new IllegalArgumentException(
      s"MERGE $side must be a named table, got ${other.nodeName}")
  }

  /** The USING side: a named view/table or an aliased subquery, analyzed by
   *  Spark itself. The alias (or the bare view name) qualifies guard refs. */
  private def sourceOf(spark: SparkSession, plan: LogicalPlan): (DataFrame, String) = {
    val alias = plan match {
      case SubqueryAlias(ident, _) => ident.name
      case UnresolvedRelation(parts, _, _) => parts.last
      case other => throw new IllegalArgumentException(
        s"MERGE source must be a named table/view or an aliased subquery, got ${other.nodeName}")
    }
    (GraftColumnBridge.dataset(spark, plan), alias)
  }

  /** ON must be a conjunction of same-named `t.k = s.k` equalities — the
   *  equi-key contract LakeTable.merge (and a shuffle-join at 100 TB) needs. */
  private def equiKeys(cond: Expression, tgt: String, src: String): Seq[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        val (qa, ca) = qualifierAndName(a)
        val (qb, cb) = qualifierAndName(b)
        require(ca == cb,
          s"ON equality joins differently-named columns ($ca vs $cb) — " +
            "the engine merge keys on shared column names")
        val quals = Set(qa, qb)
        require(quals == Set(norm(tgt), norm(src)),
          s"ON equality must relate the target and source aliases, got $qa = $qb")
        ca
      case other => throw new IllegalArgumentException(
        s"ON must be a conjunction of column equalities, got: ${other.sql}")
    }
  }

  private def qualifierAndName(a: UnresolvedAttribute): (String, String) = {
    require(a.nameParts.length == 2,
      s"qualify '${a.name}' as <alias>.<column> in the MERGE statement")
    (norm(a.nameParts.head), a.nameParts.last)
  }

  /** Rewrite guard references onto the engine merge's fixed `s`/`t` aliases. */
  private def requalify(e: Expression, tgt: String, src: String): Expression =
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.length == 2 &&
          norm(a.nameParts.head) == norm(src) =>
        UnresolvedAttribute(Seq("s", a.nameParts.last))
      case a: UnresolvedAttribute if a.nameParts.length == 2 &&
          norm(a.nameParts.head) == norm(tgt) =>
        UnresolvedAttribute(Seq("t", a.nameParts.last))
      case a: UnresolvedAttribute => throw new IllegalArgumentException(
        s"qualify '${a.name}' with the source or target alias in the matched guard")
    }
}
