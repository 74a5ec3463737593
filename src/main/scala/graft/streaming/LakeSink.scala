package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.lake.LakeTable

/**
 * EXACTLY-ONCE STREAMING SINK into a [[LakeTable]] — the
 * `writeStream.format("delta")` role for ANY streaming DataFrame (the
 * CSV-specific [[graft.ingest.BronzeIngest]] is one producer; this is the
 * general sink): `foreachBatch` + [[LakeTable.appendIdempotent]] keyed by
 * the sink's `appId` and Structured Streaming's epoch id.
 *
 * The exactly-once argument is Delta's streaming-sink discipline verbatim:
 * Structured Streaming replays an incompletely-committed micro-batch after
 * a crash WITH THE SAME epoch id, and the table's transaction ledger
 * (`txnAppId`/`txnVersion` riding the manifest) makes the replayed
 * `appendIdempotent(appId, epochId, ...)` a no-op — so each micro-batch's
 * rows land exactly once no matter where the stream dies. Two independent
 * sinks into one table use distinct `appId`s and interleave safely (the
 * ledger is per-app; the manifest CAS serializes the commits).
 *
 * Scale: cost per trigger is O(micro-batch), never O(table); the append
 * path is the same partition-clustered, stats/bloom-collecting write every
 * batch append pays. Constraints and generated columns are enforced
 * per batch — a violating batch fails the QUERY, not the table.
 */
object LakeSink {

  /**
   * Drain everything currently available from `stream` into `tbl` with
   * `Trigger.AvailableNow` (the reference's trigger-once incremental-batch
   * pattern), then stop. Returns the number of micro-batches that actually
   * committed (replayed duplicates excluded).
   */
  def appendStream(stream: DataFrame, tbl: LakeTable, appId: String,
      checkpointDir: String, mergeSchema: Boolean = false): Long = {
    require(appId.nonEmpty, "LakeSink needs a non-empty appId")
    val committed = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (tbl.appendIdempotent(appId, epochId, batch, mergeSchema))
          committed.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    committed.get()
  }
}
