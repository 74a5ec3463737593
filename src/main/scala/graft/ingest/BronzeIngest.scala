package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructType}

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
 *  - O7 rescue mode (`schemaEvolutionMode=rescue`): the persisted schema is
 *    extended with a `_rescued_data` string column bound to
 *    `columnNameOfCorruptRecord` under PERMISSIVE parsing — malformed or
 *    ill-typed rows land with their raw line rescued instead of failing the
 *    stream. (Deviation: Auto Loader rescues per-field, we rescue per-row;
 *    downstream behavior — `drop("_rescued_data")` after consumption — is
 *    identical.)
 *  - S2 + O5: `Trigger.AvailableNow` drains everything not yet checkpointed,
 *    appends to the bronze [[LakeTable]] via `foreachBatch`, then stops —
 *    the reference's `trigger(once=True)` incremental-batch pattern.
 *
 * Append is O(new files): bronze stays append-only (`README.md:89`), so
 * ingest cost at 100 TB is bounded by the new-data volume, never table size.
 */
object BronzeIngest {

  /** Drain all currently-available CSV files under `sourceDir` into the
   *  bronze table at `tableRoot`. Returns the number of rows appended. */
  def run(spark: SparkSession, sourceDir: String, tableRoot: String,
      checkpointDir: String): Long = {
    val schema = loadOrInferSchema(spark, sourceDir, tableRoot)
    val withRescue =
      if (schema.fieldNames.contains(RescueCol)) schema
      else schema.add(RescueCol, StringType, nullable = true)

    val table = LakeTable(spark, tableRoot).create(withRescue)
    val before = if (table.exists) table.read.count() else 0L

    val stream = spark.readStream
      .schema(withRescue)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", RescueCol)
      .csv(sourceDir)

    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // foreachBatch can replay a batch after a crash; the batch-id ledger
        // makes the append idempotent (exactly-once into the table).
        if (batchId > lastCommittedBatch(tableRoot)) {
          table.append(batch)
          recordBatch(tableRoot, batchId)
        }
      }
      .start()
    q.awaitTermination()
    table.read.count() - before
  }

  val RescueCol = "_rescued_data"

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
