package graft.pipeline

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias

/**
 * Lakeflow's public SQL pipeline surface over [[Pipeline]] — the statement
 * forms Databricks documents for SQL-defined pipelines (the reference's
 * pipelines are the Python-decorator equivalents,
 * `DLT_Silver_Pipeline/dlt_bronze_to_silver_pipeline.py`):
 *
 *  - `CREATE OR REFRESH STREAMING TABLE t` — declare a CDC target (the
 *    two-statement CDC idiom: declare, then APPLY CHANGES INTO it).
 *  - `CREATE OR REFRESH STREAMING TABLE t AS SELECT … [FROM STREAM(src)]` /
 *    `CREATE OR REFRESH MATERIALIZED VIEW v AS SELECT …` — a table
 *    materialized from its defining query each [[Pipeline.run]]. Under the
 *    Pipeline's documented trigger-once snapshot execution both refresh as
 *    a full recompute (DLT's MV semantic; a deterministic ST AS SELECT
 *    yields the same rows — the incremental append path is the checkpointed
 *    [[Pipeline.runCdcFlowStreaming]]/[[Pipeline.runJoinFlowStreaming]]).
 *  - `APPLY CHANGES INTO t FROM [STREAM(]src[)] KEYS (k, …)
 *     [APPLY AS DELETE WHEN cond] SEQUENCE BY seq
 *     [COLUMNS * EXCEPT (c, …)] [STORED AS SCD TYPE 1|2]
 *     [TRACK HISTORY ON (c, …) | TRACK HISTORY ON * EXCEPT (c, …)]`
 *    — the SQL form of `create_auto_cdc_flow`; `AUTO CDC INTO` (the renamed
 *    current syntax) is accepted as a synonym.
 *
 * Statements only DECLARE graph nodes (DLT semantics — nothing executes
 * until [[Pipeline.run]]). Defining queries may reference any declared
 * pipeline dataset by name — `STREAM(ds)` marks streaming-read intent and
 * resolves to the same current contents under snapshot execution — and
 * resolution happens per run, so an MV over a streaming table always sees
 * that run's post-merge state. Unknown relations are left for Spark's own
 * resolver (temp views, catalog tables compose as usual).
 */
object PipelineSql {

  private val CreateStAs =
    """(?is)\s*CREATE\s+OR\s+REFRESH\s+STREAMING\s+TABLE\s+([A-Za-z_]\w*)\s+AS\s+(.+?);?\s*""".r
  private val CreateSt =
    """(?is)\s*CREATE\s+OR\s+REFRESH\s+STREAMING\s+TABLE\s+([A-Za-z_]\w*)\s*;?\s*""".r
  private val CreateMv =
    """(?is)\s*CREATE\s+OR\s+REFRESH\s+MATERIALIZED\s+VIEW\s+([A-Za-z_]\w*)\s+AS\s+(.+?);?\s*""".r
  private val ApplyChanges =
    ("""(?is)\s*(?:APPLY\s+CHANGES|AUTO\s+CDC)\s+INTO\s+([A-Za-z_]\w*)""" +
      """\s+FROM\s+(?:STREAM\s*\(\s*([A-Za-z_]\w*)\s*\)|([A-Za-z_]\w*))""" +
      """\s+KEYS\s*\(([^)]*)\)""" +
      """(?:\s+APPLY\s+AS\s+DELETE\s+WHEN\s+(.+?))?""" +
      """\s+SEQUENCE\s+BY\s+([A-Za-z_]\w*)""" +
      """(?:\s+COLUMNS\s+\*\s+EXCEPT\s*\(([^)]*)\))?""" +
      """(?:\s+STORED\s+AS\s+SCD\s+TYPE\s+([12]))?""" +
      """(?:\s+TRACK\s+HISTORY\s+ON\s+(?:\*\s+EXCEPT\s*\(([^)]*)\)|\(([^)]*)\)))?""" +
      """\s*;?\s*""").r

  /** Execute one pipeline DDL statement against `p` (declaration only —
   *  run the graph with `p.run()`). */
  def apply(p: Pipeline, sqlText: String): Unit = sqlText match {
    case CreateStAs(name, select) =>
      p.materializedView(name)(evalSelect(p, select))
      ()
    case CreateSt(name) =>
      p.streamingTable(name)
      ()
    case CreateMv(name, select) =>
      p.materializedView(name)(evalSelect(p, select))
      ()
    case ApplyChanges(target, streamSrc, plainSrc, keys, delWhen, seqBy,
        except, scdType, trackExcept, trackOn) =>
      val source = Option(streamSrc).getOrElse(plainSrc)
      def cols(s: String): Seq[String] =
        Option(s).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      p.autoCdcFlow(target, source,
        keys = cols(keys),
        sequenceBy = seqBy.trim,
        scdType = Option(scdType).map(_.trim.toInt).getOrElse(1),
        applyAsDeletes = Option(delWhen).map(_.trim),
        exceptColumns = cols(except),
        trackHistoryColumns = cols(trackOn),
        trackHistoryExceptColumns = cols(trackExcept))
      ()
    case other => throw new IllegalArgumentException(
      "PipelineSql supports CREATE OR REFRESH STREAMING TABLE [AS SELECT] / " +
        "CREATE OR REFRESH MATERIALIZED VIEW AS SELECT / " +
        s"APPLY CHANGES (AUTO CDC) INTO, got: ${other.linesIterator.next()}")
  }

  /** Evaluate a defining SELECT with pipeline-dataset resolution: declared
   *  names (and `STREAM(name)` wrappers) are spliced in as the dataset's
   *  CURRENT contents via [[Pipeline.read]]; everything else resolves
   *  through Spark's analyzer as usual. */
  private def evalSelect(p: Pipeline, select: String): DataFrame = {
    val spark = p.spark
    // STREAM(ds) is Lakeflow's streaming-read marker, not an OSS-Spark
    // construct — under snapshot execution it reads the same current
    // contents, so unwrap it textually before parsing
    val text = select.replaceAll(
      "(?i)\\bSTREAM\\s*\\(\\s*([A-Za-z_]\\w*)\\s*\\)", "$1")
    val plan = spark.sessionState.sqlParser.parsePlan(text)
    val spliced = plan.transformUpWithSubqueries {
      case UnresolvedRelation(parts, _, _)
          if parts.length == 1 && p.contains(parts.head) =>
        SubqueryAlias(parts.head, GraftColumnBridge.logicalPlan(p.read(parts.head)))
    }
    GraftColumnBridge.dataset(spark, spliced)
  }
}
