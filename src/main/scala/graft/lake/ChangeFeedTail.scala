package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/**
 * EXACTLY-ONCE incremental consumer of a [[LakeTable]] change feed — the
 * shape a downstream pipeline uses to tail a 100 TB table: each cycle
 * processes only the versions committed since the last checkpoint, cost
 * O(new changes), independent of table size (Delta's
 * `readStream.option("readChangeFeed", true)` role, built on the engine's
 * own version ledger instead of a DSv2 source).
 *
 * Protocol: `poll()` → process the returned batch → `commit(batch.toVersion)`.
 * The checkpoint advances ONLY on commit, so a consumer that crashes
 * mid-batch re-polls the SAME batch on restart — at-least-once delivery
 * that becomes exactly-once under the standard transactional-sink rule
 * (commit the checkpoint with the output, or make the output idempotent by
 * `_commit_version`). The checkpoint write is atomic (temp file + rename),
 * matching the manifest CAS discipline.
 *
 * Version semantics per commit op:
 *  - append / merge / delete / update / replace → row-level changes, read
 *    via [[LakeTable.readChangeFeed]] version by version;
 *  - create / constraint / index / optimize / compact → no LOGICAL row
 *    change (maintenance materializes deletion vectors but preserves the
 *    row set) → skipped, the checkpoint steps over them;
 *  - overwrite / restore / clone → true snapshot rewrites with no
 *    row-level delta → `poll` fails LOUDLY (Delta likewise refuses CDF
 *    across non-CDC rewrites; the consumer must re-bootstrap).
 */
final class ChangeFeedTail private (tbl: LakeTable, checkpointDir: Path) {

  private val ckFile = checkpointDir.resolve("cdf_version")

  /** Last version this consumer has committed, -1 before the first commit
   *  (a fresh tail starts from the table's beginning). */
  def committedVersion: Long =
    if (!Files.exists(ckFile)) -1L
    else new String(Files.readAllBytes(ckFile), StandardCharsets.UTF_8).trim.toLong

  /** The row-level changes committed after the checkpoint, with the version
   *  range they cover, or None when the consumer is caught up. Maintenance
   *  and metadata commits inside the range are skipped (and covered by the
   *  returned `toVersion`, so `commit` steps the checkpoint past them). */
  def poll(): Option[ChangeFeedTail.ChangeBatch] = {
    val from = committedVersion + 1
    val cur = tbl.currentVersion
    if (from > cur) return None
    val ops = tbl.history.filter { case (v, _) => v >= from && v <= cur }
    ops.collectFirst {
      case (v, op) if ChangeFeedTail.RewriteOps(op) =>
        sys.error(s"change-feed tail hit a $op commit at v$v — no row-level " +
          "delta exists across it; re-bootstrap the consumer from the " +
          "current snapshot")
    }
    val rowVersions = ops.collect {
      case (v, op) if ChangeFeedTail.RowChangeOps(op) => v
    }
    val parts = rowVersions.map(v => tbl.readChangeFeed(v, Some(v)))
    if (parts.isEmpty) {
      // only maintenance in range: advance silently via an empty batch
      Some(ChangeFeedTail.ChangeBatch(None, from, cur))
    } else {
      Some(ChangeFeedTail.ChangeBatch(
        Some(parts.reduce(_ unionByName _)), from, cur))
    }
  }

  /** Advance the checkpoint to `upTo` (inclusive) — call AFTER the batch's
   *  output is durable. Atomic temp-file + rename; monotone (a stale
   *  commit below the checkpoint is refused loudly). */
  def commit(upTo: Long): Unit = {
    require(upTo >= committedVersion,
      s"commit($upTo) would move the checkpoint backwards from $committedVersion")
    require(upTo <= tbl.currentVersion,
      s"commit($upTo) is beyond the table's version ${tbl.currentVersion}")
    val tmp = checkpointDir.resolve(s"cdf_version.tmp.${java.util.UUID.randomUUID()}")
    Files.write(tmp, upTo.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, ckFile, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }
}

object ChangeFeedTail {

  /** One polled increment: the row-level changes (None when the covered
   *  range held only maintenance commits) and the inclusive version range
   *  the checkpoint should advance over. */
  final case class ChangeBatch(
      changes: Option[DataFrame], fromVersion: Long, toVersion: Long)

  private val RowChangeOps =
    Set("append", "convert", "merge", "delete", "update", "replace")
  private val RewriteOps = Set("overwrite", "restore", "clone")

  /** Open (or resume) a tail of `tbl` checkpointed under `checkpointDir`. */
  def apply(tbl: LakeTable, checkpointDir: String): ChangeFeedTail = {
    val dir = Paths.get(checkpointDir)
    Files.createDirectories(dir)
    new ChangeFeedTail(tbl, dir)
  }
}
