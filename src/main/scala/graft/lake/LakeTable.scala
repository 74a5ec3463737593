package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Base64, UUID}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/**
 * Parquet-backed versioned table — the engine's replacement for the Delta
 * tables the reference writes everywhere (bronze sinks
 * `bronze_ingest_autoloader.py:23-28`, DLT streaming tables, gold MERGE
 * targets `DIM_Gold_layer.py:276-289`, `FACT_Gold_Layer.py:185-198`).
 * No Delta/Iceberg jar ships in this environment, so the table protocol is
 * rebuilt on plain Parquet with a tiny manifest-pointer commit scheme:
 *
 * {{{
 *   root/
 *     _VERSION                 // pointer file: current version number (atomic swap)
 *     _commits/v000000001.mf   // manifest: schema + partition col + dir entries
 *     data/<uuid>/part-*.parquet            (unpartitioned)
 *     data/<uuid>/<pcol>=<val>/part-*.parquet  (partitioned)
 * }}}
 *
 * Commit = write data files to a fresh `data/<uuid>` dir, then PUBLISH the
 * next manifest with a conditional put: the manifest bytes are staged to a
 * temp file and hard-linked to `_commits/vN.mf` — link creation is atomic
 * and fails with EEXIST if another writer already owns version N. This is
 * Delta's optimistic-concurrency commit protocol (`DIM_Gold_layer.py:276`
 * merges run under it) rebuilt on POSIX semantics:
 *
 *  - MULTI-WRITER SAFE across instances and processes on a shared
 *    filesystem: exactly one writer wins each version.
 *  - `append`/`overwrite` auto-retry on a lost race (their payload does not
 *    depend on the losing snapshot; append re-reads the entry list and
 *    re-commits — the data dir is already on disk, so a retry is
 *    manifest-only).
 *  - `merge`/`compact` are computed FROM a snapshot, so a lost race throws
 *    [[ConcurrentWriteException]] — the caller recomputes against the new
 *    version and retries, exactly Delta's `ConcurrentAppendException`
 *    contract.
 *
 * `_VERSION` is a monotonic cache of the newest version, updated after a
 * successful publish; readers resolve it and probe forward over `_commits`
 * so a stale pointer can never hide a committed version. Readers always see
 * a consistent snapshot (old versions' files are retained until `vacuum`).
 *
 * '''Partitioned tables''' (the 100 TB path): a table created with a
 * partition column tracks, per data dir, WHICH partition values that dir
 * currently owns. `merge` then touches only the partitions present in the
 * source: it partition-prunes the target read, rewrites just those
 * partitions into a new dir, and re-points ownership — cost is O(touched
 * partitions), independent of table size. `append` adds a dir owning the
 * batch's partitions without disturbing earlier owners (append-only
 * accumulation). Reads union the per-dir scans filtered to owned values;
 * the ownership filter is an equality OR-chain on the partition column, so
 * Spark's partition pruning skips non-owned directories entirely.
 *
 * Unpartitioned scale notes: `append` is O(new data) — it never rewrites
 * existing files, so streaming ingest cost is independent of table size.
 * `merge` is join-based (shuffle on the merge keys, broadcast when the
 * source is small — left to AQE) and rewrites on commit.
 */
/** A snapshot-dependent commit (merge/compact) lost an optimistic-concurrency
 *  race: the table advanced past the version the result was computed from.
 *  Callers recompute against the new current version and retry — the same
 *  contract as Delta's concurrent-modification exceptions. */
final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

final class LakeTable private (val spark: SparkSession, val root: String,
    clock: () => Long) {
  import LakeTable._

  private def versionFile: Path = Paths.get(root, "_VERSION")
  private def commitsDir: Path = Paths.get(root, "_commits")
  private def manifestFile(v: Long): Path = commitsDir.resolve(f"v$v%09d.mf")

  def exists: Boolean = Files.exists(versionFile) || Files.exists(manifestFile(0))

  /** Newest committed version: the `_VERSION` cache, probed forward over
   *  `_commits` — a concurrent writer that published but hasn't refreshed
   *  the pointer yet is still visible. */
  def currentVersion: Long = {
    require(exists, s"LakeTable at $root does not exist")
    var v =
      if (Files.exists(versionFile))
        new String(Files.readAllBytes(versionFile), StandardCharsets.UTF_8).trim.toLong
      else -1L
    while (Files.exists(manifestFile(v + 1))) v += 1
    require(v >= 0, s"LakeTable at $root has a pointer but no manifest")
    v
  }

  private def b64e(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def b64d(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** Resolved manifests by version. Committed manifest files are immutable
   *  (the CAS link publishes exactly one file per version, never rewritten),
   *  so cached resolutions can never go stale — the cache only bounds the
   *  repeated IO of delta-chain resolution. Kept small: snapshot reads only
   *  ever need the chain back to the nearest checkpoint. */
  private val mfCache = new java.util.concurrent.ConcurrentHashMap[Long, Manifest]()

  /** Chain depth of version `v`'s manifest file: 0 for a full checkpoint,
   *  parent's depth + 1 for a delta. Reads only the first two lines —
   *  delta files lead with `base=`/`chain=`. */
  private def chainLenOf(v: Long): Int = {
    val it = Files.lines(manifestFile(v), StandardCharsets.UTF_8)
    try it.iterator().asScala.take(2).collectFirst {
      case l if l.startsWith("chain=") => l.stripPrefix("chain=").toInt
    }.getOrElse(0) finally it.close()
  }

  private def parseDirEntry(s: String): DirEntry = s.split('|') match {
    case Array(d) => DirEntry(d, None)
    case Array(d, owned) =>
      DirEntry(d, Some(owned.split(',').toSeq.filter(_.nonEmpty).map(b64d)))
    // third field: entry flags — "c" marks the dir clustered on the
    // manifest's clusterKey (an empty second field keeps owned = None)
    case Array(d, owned, flags) =>
      DirEntry(d,
        if (owned.isEmpty) None
        else Some(owned.split(',').toSeq.filter(_.nonEmpty).map(b64d)),
        clustered = flags.contains('c'))
    case _ => sys.error(s"bad manifest dir entry: $s")
  }

  /** Load version `v`'s manifest. A file is either a FULL checkpoint (the
   *  complete snapshot) or a DELTA against `base=` (its immediate parent):
   *  all O(columns + writers) metadata is carried in full either way, and
   *  only the O(files) `dir=`/`fstat=` body is diff-encoded (`adddir=` /
   *  `rmdir=` / added `fstat=`). Resolution walks the chain to the nearest
   *  checkpoint (bounded by [[LakeTable.ManifestCheckpointInterval]]) and
   *  is memoized per instance. */
  private def readManifest(v: Long): Manifest = {
    val cached = mfCache.get(v)
    if (cached != null) return cached
    val lines = Files.readAllLines(manifestFile(v), StandardCharsets.UTF_8).asScala
    val own = parseManifestLines(v, lines)
    val m = lines.collectFirst {
      case l if l.startsWith("base=") => l.stripPrefix("base=").toLong
    } match {
      case None => own
      case Some(b) =>
        val parent = readManifest(b)
        val rmDirs = lines.collect {
          case l if l.startsWith("rmdir=") => l.stripPrefix("rmdir=")
        }.toSet
        val addEntries = lines.collect {
          case l if l.startsWith("adddir=") => parseDirEntry(l.stripPrefix("adddir="))
        }.toSeq
        // `fstat=` lines in a delta are the ADDED stats only
        val addPaths = own.fileStats.map(_.path).toSet
        val entries = parent.entries.filterNot(e => rmDirs.contains(e.dir)) ++ addEntries
        val fileStats = parent.fileStats.filterNot(f =>
          addPaths.contains(f.path) || rmDirs.exists(d => f.path.startsWith(d + "/"))) ++
          own.fileStats
        own.copy(entries = entries, fileStats = fileStats)
    }
    mfCache.put(v, m)
    if (mfCache.size() > 32) {
      val ks = mfCache.keySet().asScala.toSeq.sorted
      ks.dropRight(16).foreach(k => mfCache.remove(k))
    }
    m
  }

  private def parseManifestLines(v: Long,
      lines: scala.collection.Seq[String]): Manifest = {
    val schemaB64 = lines.collectFirst { case l if l.startsWith("schema=") => l.stripPrefix("schema=") }
      .getOrElse(sys.error(s"manifest v$v missing schema"))
    val schema = StructType.fromDDL(b64d(schemaB64))
    val pcol = lines.collectFirst { case l if l.startsWith("pcol=") => l.stripPrefix("pcol=") }
    val op = lines.collectFirst { case l if l.startsWith("op=") => l.stripPrefix("op=") }
      .getOrElse("unknown")
    val cdfEnabled = lines.contains("cdf=on")
    val commitTsMs = lines.collectFirst { case l if l.startsWith("ts=") =>
      l.stripPrefix("ts=").toLong }
    val cdfDir = lines.collectFirst { case l if l.startsWith("cdfdir=") => l.stripPrefix("cdfdir=") }
    val statsCols = lines.collectFirst { case l if l.startsWith("statscols=") =>
      l.stripPrefix("statscols=").split(',').toSeq.filter(_.nonEmpty).map(b64d)
    }.getOrElse(Nil)
    val constraints = lines.collect {
      case l if l.startsWith("check=") =>
        val Array(n, e) = l.stripPrefix("check=").split(':')
        b64d(n) -> b64d(e)
    }.toSeq
    val generated = lines.collect {
      case l if l.startsWith("gen=") =>
        val Array(n, e) = l.stripPrefix("gen=").split(':')
        b64d(n) -> b64d(e)
    }.toSeq
    val entries = lines.collect {
      case l if l.startsWith("dir=") => parseDirEntry(l.stripPrefix("dir="))
    }.toSeq
    val fileStats = lines.collect {
      case l if l.startsWith("fstat=") =>
        val parts = l.stripPrefix("fstat=").split('|')
        FileStat(b64d(parts.head), parts.tail.toSeq.map { cs =>
          val Array(c, mn, mx) = cs.split(':')
          b64d(c) -> ((b64d(mn), b64d(mx)))
        }.toMap)
    }.toSeq
    val deleteVectors = lines.collect {
      case l if l.startsWith("dv=") => l.stripPrefix("dv=")
    }.toSeq
    val bloomCols = lines.collectFirst { case l if l.startsWith("bloomcols=") =>
      l.stripPrefix("bloomcols=").split(',').toSeq.filter(_.nonEmpty).map(b64d)
    }.getOrElse(Nil)
    val txns = lines.collect {
      case l if l.startsWith("txn=") =>
        val Array(a, tv) = l.stripPrefix("txn=").split(':')
        b64d(a) -> tv.toLong
    }.toSeq
    val dropped = lines.collectFirst { case l if l.startsWith("dropped=") =>
      l.stripPrefix("dropped=").split(',').toSeq.filter(_.nonEmpty).map(b64d)
    }.getOrElse(Nil)
    val colMap = lines.collectFirst { case l if l.startsWith("colmap=") =>
      l.stripPrefix("colmap=").split(',').toSeq.filter(_.nonEmpty).map { kv =>
        val Array(lg, ph) = kv.split(':')
        b64d(lg) -> b64d(ph)
      }
    }.getOrElse(Nil)
    val props = lines.collect {
      case l if l.startsWith("prop=") =>
        val Array(k, v0) = l.stripPrefix("prop=").split(':')
        b64d(k) -> b64d(v0)
    }.toSeq
    val clusterKey = lines.collectFirst { case l if l.startsWith("ckey=") =>
      l.stripPrefix("ckey=").split(',').toSeq.filter(_.nonEmpty).map(b64d)
    }.getOrElse(Nil)
    Manifest(schema, pcol, entries, op, cdfEnabled, cdfDir, statsCols, fileStats,
      commitTsMs, constraints, generated, deleteVectors, bloomCols, txns,
      dropped, colMap, props, clusterKey)
  }

  private def manifest: Manifest = readManifest(currentVersion)

  def schema: StructType = manifest.schema

  /** Partition column, if this table is partitioned. */
  def partitionColumn: Option[String] = manifest.pcol

  /** Distinct partition values currently owned (manifest-resolved — no data
   *  scan; the SHOW PARTITIONS backing). Empty for unpartitioned tables. */
  def ownedPartitionValues: Seq[String] =
    manifest.entries.flatMap(_.owned.getOrElse(Nil)).distinct

  /** Snapshot read of the current version (explicit schema: no inference
   *  drift, empty tables read fine; partitioned reads prune to owned dirs). */
  def read: DataFrame = readScoped(manifest, None)

  /** TIME-TRAVEL read of historical version `v` (Delta
   *  `VERSION AS OF` — `DIM_Gold_layer.py` targets run under Delta's
   *  versioned protocol). Works for any version whose data dirs `vacuum`
   *  still retains; a vacuumed version fails loudly rather than returning a
   *  partial snapshot. */
  def readVersion(v: Long): DataFrame = {
    require(exists, s"LakeTable at $root does not exist")
    require(v >= 0 && v <= currentVersion, s"version $v out of range [0, $currentVersion]")
    val m = readManifest(v)
    val missing = (m.entries.map(_.dir) ++ m.deleteVectors)
      .filterNot(d => Files.isDirectory(Paths.get(root, d)))
    require(missing.isEmpty,
      s"version $v has been vacuumed (missing ${missing.mkString(", ")})")
    readScoped(m, None)
  }

  /** Commit history, oldest first: (version, operation). Operations:
   *  create/append/overwrite/merge/delete/update/compact/restore/clone/
   *  constraint. */
  def history: Seq[(Long, String)] = {
    require(exists, s"LakeTable at $root does not exist")
    (0L to currentVersion).filter(v => Files.exists(manifestFile(v)))
      .map(v => v -> manifestHeader(v)._1)
  }

  /** DESCRIBE HISTORY with commit wall-clocks, oldest first:
   *  (version, operation, commit epoch ms — None only for manifests written
   *  before the clock field existed). */
  def historyDetail: Seq[(Long, String, Option[Long])] = {
    require(exists, s"LakeTable at $root does not exist")
    (0L to currentVersion).filter(v => Files.exists(manifestFile(v)))
      .map { v => val (op, ts) = manifestHeader(v); (v, op, ts) }
  }

  /** Cheap manifest header scan — (op, commit ts) only, skipping the schema
   *  DDL parse and the per-file stats bodies. History listings and timestamp
   *  resolution over long histories are O(versions × header line scan), not
   *  O(versions × full manifest parse). */
  private def manifestHeader(v: Long): (String, Option[Long]) = {
    var op = "unknown"; var ts: Option[Long] = None
    val it = Files.lines(manifestFile(v), StandardCharsets.UTF_8)
    try it.iterator().asScala.foreach { l =>
      if (l.startsWith("op=")) op = l.stripPrefix("op=")
      else if (l.startsWith("ts=")) ts = Some(l.stripPrefix("ts=").toLong)
    } finally it.close()
    (op, ts)
  }

  /** TIME TRAVEL by wall-clock (Delta `TIMESTAMP AS OF`): the snapshot of
   *  the LATEST commit published at or before `epochMs` — Delta's rule
   *  exactly (a timestamp between commits resolves to the earlier one; a
   *  timestamp before the first commit is an error). Commit clocks are
   *  stamped at publish time and monotone within a writer; the resolver
   *  takes the last version whose clock qualifies, so a clock tie between
   *  racing historical writers resolves to the newer version. */
  def readTimestampAsOf(epochMs: Long): DataFrame =
    readVersion(versionAtTimestamp(epochMs))

  /** The version [[readTimestampAsOf]] resolves `epochMs` to — the latest
   *  commit published at or before it (Delta's resolution rule). */
  def versionAtTimestamp(epochMs: Long): Long = {
    require(exists, s"LakeTable at $root does not exist")
    val candidates = (0L to currentVersion)
      .filter(v => Files.exists(manifestFile(v)))
      .flatMap { v => manifestHeader(v)._2.collect {
        case ts if ts <= epochMs => v
      } }
    require(candidates.nonEmpty,
      s"no commit at or before epoch ms $epochMs in $root " +
        "(timestamp precedes the table's first commit)")
    candidates.max
  }

  /** RESTORE to historical version `v` (Delta `RESTORE TABLE ... TO VERSION
   *  AS OF`): publishes a NEW version whose file set is version `v`'s — a
   *  metadata-only commit (no data is copied or rewritten), so a bad merge
   *  or overwrite is undone in O(manifest). History is preserved: the
   *  intermediate versions remain readable via [[readVersion]] until
   *  `vacuum` reclaims them, and the restore itself can be restored over.
   *  Fails loudly if `v`'s data dirs have already been vacuumed. Like
   *  Delta, the change feed does not span a restore (it is a rewrite-class
   *  commit, not row-level change). */
  def restore(v: Long): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    require(v >= 0 && v <= currentVersion,
      s"version $v out of range [0, $currentVersion]")
    val m = readManifest(v)
    val missing = (m.entries.map(_.dir) ++ m.deleteVectors)
      .filterNot(d => Files.isDirectory(Paths.get(root, d)))
    require(missing.isEmpty,
      s"cannot restore to vacuumed version $v (missing ${missing.mkString(", ")})")
    commitWithRetry { () =>
      val cur = currentVersion
      val curM = readManifest(cur)
      (Manifest(m.schema, m.pcol, m.entries, "restore",
        cdfEnabled = curM.cdfEnabled, statsCols = m.statsCols,
        fileStats = m.fileStats, constraints = m.constraints,
        generated = m.generated, deleteVectors = m.deleteVectors,
        txns = curM.txns, droppedCols = curM.droppedCols,
        bloomCols = m.bloomCols, colMap = m.colMap, props = m.props,
        clusterKey = m.clusterKey), cur + 1)
    }
  }

  /** SHALLOW CLONE of the current snapshot into `targetRoot` (Delta
   *  `CREATE TABLE ... SHALLOW CLONE src`): the clone is a fully independent
   *  table — its own version history, its own future commits — whose v0
   *  re-references the source's data files without copying bytes. On this
   *  POSIX backend the re-reference is a hard link per file (O(file count)
   *  metadata, zero data movement; source and clone can then be written,
   *  compacted, or vacuumed independently — neither can orphan the other's
   *  files). An object-store deployment would store absolute source paths
   *  in the manifest instead; the commit protocol is unchanged either way. */
  def shallowClone(targetRoot: String): LakeTable =
    cloneTo(targetRoot, deep = false)

  /** Delta's `CREATE TABLE … DEEP CLONE src` — a SELF-CONTAINED fork for
   *  archival/DR: data files, deletion vectors, and bloom sidecars are
   *  physically COPIED (no shared inodes), so the clone survives anything
   *  that happens to the source — vacuum, rewrite, even deletion of the
   *  source root — and vice versa. O(data bytes) I/O by definition; the
   *  O(files) dev/test fork remains [[shallowClone]]. Like Delta, only the
   *  CURRENT snapshot is copied (the clone's history starts at v0); the
   *  source's full metadata (schema, constraints, properties, transaction
   *  ledger, column mapping) carries over. */
  def deepClone(targetRoot: String): LakeTable =
    cloneTo(targetRoot, deep = true)

  private def cloneTo(targetRoot: String, deep: Boolean): LakeTable = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    val m = manifest
    val dst = new LakeTable(spark, targetRoot, clock)
    require(!dst.exists, s"clone target $targetRoot already exists")
    Files.createDirectories(Paths.get(targetRoot))
    def adopt(src: Path, dstFile: Path): Unit = {
      Files.createDirectories(dstFile.getParent)
      if (deep) { Files.copy(src, dstFile); () }
      else { Files.createLink(dstFile, src); () }
    }
    // deletion vectors ride along: coordinates are root-RELATIVE, and the
    // clone adopts the data files under the same relative layout, so the
    // vectors address the clone's rows exactly
    (m.entries.map(_.dir) ++ m.deleteVectors).foreach { d =>
      listParquet(Paths.get(root, d)).foreach { src =>
        adopt(src, Paths.get(targetRoot).resolve(Paths.get(root).relativize(src)))
      }
    }
    // bloom sidecars are keyed by dir uuid and reference root-relative
    // paths — adopt them so the clone keeps its point-lookup pruning
    m.entries.map(e => bloomIndexFile(e.dir)).filter(Files.exists(_)).foreach { src =>
      adopt(src, Paths.get(targetRoot, "_bloom", src.getFileName.toString))
    }
    require(dst.tryCommit(Manifest(m.schema, m.pcol, m.entries, "clone",
      cdfEnabled = m.cdfEnabled, statsCols = m.statsCols,
      fileStats = m.fileStats, constraints = m.constraints,
      generated = m.generated, deleteVectors = m.deleteVectors,
      txns = m.txns, droppedCols = m.droppedCols,
      bloomCols = m.bloomCols, colMap = m.colMap, props = m.props,
      clusterKey = m.clusterKey), 0L),
      s"clone target $targetRoot was created concurrently")
    dst
  }

  /** Active CHECK constraints (name → SQL boolean expression). */
  def checkConstraints: Map[String, String] = manifest.constraints.toMap

  /** DESCRIBE DETAIL (Delta parity): table-level facts resolved from the
   *  manifest + a driver-side file listing of the CURRENT snapshot only —
   *  O(current files) metadata, no data scan. */
  def detail: LakeTable.TableDetail = {
    require(exists, s"LakeTable at $root does not exist")
    val m = manifest
    val files = m.entries.flatMap(e => listParquet(Paths.get(root, e.dir)))
    LakeTable.TableDetail(
      location = root,
      version = currentVersion,
      numFiles = files.size.toLong,
      sizeInBytes = files.map(Files.size).sum,
      partitionColumns = m.pcol.toSeq,
      statsColumns = m.statsCols,
      changeFeedEnabled = m.cdfEnabled,
      constraints = m.constraints.toMap,
      generatedColumns = m.generated.toMap,
      lastOperation = m.op,
      lastCommitTimestampMs = m.commitTsMs,
      deletionVectors = m.deleteVectors.size,
      bloomFilterColumns = m.bloomCols,
      clusteringColumns = m.props.toMap.get(LakeTable.ClusterByProp).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty))
  }

  /** ADD a CHECK constraint (Delta `ALTER TABLE ... ADD CONSTRAINT ... CHECK`):
   *  existing data is validated first — like Delta, the constraint is refused
   *  if any current row violates it — then a metadata-only commit records it;
   *  every later append/overwrite/merge/update batch is enforced against it
   *  (a violating batch fails BEFORE commit). NULL predicate results count as
   *  violations (three-valued logic, matching the expectations gate). */
  def addCheckConstraint(name: String, expression: String): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    require(name.nonEmpty && !name.contains(':'), s"bad constraint name $name")
    // validation runs INSIDE the commit loop against the exact snapshot the
    // constraint commit lands on top of: a concurrent append racing this add
    // loses the CAS, we re-read the grown snapshot and re-validate it — no
    // check-then-commit window where unvalidated data slips under an active
    // constraint (mirrors Delta's metadata-conflict detection)
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      require(!cur.constraints.exists(_._1 == name),
        s"constraint $name already exists")
      val bad = readScoped(cur, None)
        .filter(!coalesce(expr(expression), lit(false))).limit(1).count()
      require(bad == 0,
        s"cannot add CHECK constraint $name ($expression): existing rows violate it")
      (cur.copy(op = "constraint", cdfDir = None, commitTsMs = None,
        constraints = cur.constraints :+ (name -> expression)), v + 1)
    }
  }

  /** ADD a bloom-index column (Delta `CREATE BLOOMFILTER INDEX` analog):
   *  metadata-only commit — every LATER write builds sidecar blooms for the
   *  column; files written before the add have no entries and simply never
   *  prune (the index is an optimization, never a filter). `optimizeCompact`
   *  or `compact` re-writes old data under the new index. */
  def addBloomFilterColumn(c: String): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      require(cur.schema.fieldNames.contains(c), s"unknown column $c")
      require(!cur.pcol.contains(c),
        s"$c is the partition column — the Hive layout already prunes it")
      require(!cur.bloomCols.contains(c), s"$c is already bloom-indexed")
      (cur.copy(op = "index", cdfDir = None, commitTsMs = None,
        bloomCols = cur.bloomCols :+ c), v + 1)
    }
  }

  /** DROP a bloom-index column (metadata-only; sidecars for it become dead
   *  weight until their data dirs rotate out). */
  def dropBloomFilterColumn(c: String): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      require(cur.bloomCols.contains(c), s"$c is not bloom-indexed")
      (cur.copy(op = "index", cdfDir = None, commitTsMs = None,
        bloomCols = cur.bloomCols.filterNot(_ == c)), v + 1)
    }
  }

  /** DROP a CHECK constraint (metadata-only commit). */
  def dropCheckConstraint(name: String): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      require(cur.constraints.exists(_._1 == name), s"no constraint named $name")
      (cur.copy(op = "constraint", cdfDir = None, commitTsMs = None,
        constraints = cur.constraints.filterNot(_._1 == name)), v + 1)
    }
  }

  /**
   * METADATA-ONLY DROP COLUMN (`ALTER TABLE ... DROP COLUMN`): the manifest
   * schema shrinks and every read projects it away — no data file is
   * touched, O(manifest) at any table size (where a rewrite-based drop is
   * O(table)). The column's zone stats, bloom index and stats registration
   * are dropped with it. The name is TOMBSTONED: old files still carry the
   * bytes, so schema evolution re-adding the name would resurrect stale
   * values — evolution rejects tombstoned names until a full rewrite
   * (overwrite/compact) physically sheds them. Dropping the partition
   * column, a generated column's source, or a constraint-referenced column
   * is refused. Time travel to pre-drop versions still serves the column.
   */
  def dropColumn(colName: String): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    def refs(e: String): Boolean =
      spark.sessionState.sqlParser.parseExpression(e).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts.head.equalsIgnoreCase(colName) => a
      }.nonEmpty
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      val f = cur.schema.fields.find(_.name.equalsIgnoreCase(colName))
        .getOrElse(throw new IllegalArgumentException(
          s"no column $colName in ${cur.schema.fieldNames.mkString(",")}"))
      val c = f.name
      require(cur.schema.fields.length > 1, "cannot drop the only column")
      require(!cur.pcol.contains(c), s"cannot drop partition column $c")
      cur.constraints.foreach { case (n, e) => require(!refs(e),
        s"constraint $n references $c — drop the constraint first") }
      cur.generated.foreach { case (g, e) => require(g == c || !refs(e),
        s"generated column $g is computed from $c — drop it first") }
      val pc = physName(cur, c) // files carry the physical name forever
      (cur.copy(op = "alter", cdfDir = None, commitTsMs = None,
        schema = StructType(cur.schema.fields.filterNot(_.name == c)),
        statsCols = cur.statsCols.filterNot(_ == c),
        fileStats = cur.fileStats.map(fs => fs.copy(minMax = fs.minMax - pc)),
        generated = cur.generated.filterNot(_._1 == c),
        bloomCols = cur.bloomCols.filterNot(_ == c),
        colMap = cur.colMap.filterNot(_._1 == c),
        droppedCols = cur.droppedCols :+ pc), v + 1)
    }
  }

  /**
   * METADATA-ONLY ADD COLUMNS (`ALTER TABLE ... ADD COLUMNS (c TYPE, ...)`,
   * Delta's additive evolution as an explicit DDL instead of a write-side
   * `mergeSchema`): the manifest schema widens, the new columns nullable;
   * every existing file serves NULL for them on read (the scan is planned
   * with the widened schema — parquet name-resolution yields NULL for
   * absent columns). No data file is touched — O(manifest) at any table
   * size. Tombstoned names ([[dropColumn]]) are rejected: old files still
   * carry their bytes and would resurrect stale values. Duplicate and
   * nested names are refused.
   */
  def addColumns(cols: Seq[(String, org.apache.spark.sql.types.DataType)]): Unit =
    synchronized {
      require(exists, s"LakeTable at $root does not exist")
      require(cols.nonEmpty, "ADD COLUMNS needs at least one column")
      cols.foreach { case (n, _) =>
        require(!n.contains("."), s"nested column $n is not supported") }
      val dups = cols.groupBy(_._1.toLowerCase(java.util.Locale.ROOT))
        .filter(_._2.size > 1)
      require(dups.isEmpty,
        s"duplicate column name(s) in ADD COLUMNS: ${dups.keys.mkString(", ")}")
      commitWithRetry { () =>
        val v = currentVersion
        val cur = readManifest(v)
        cols.foreach { case (n, _) =>
          require(!cur.schema.fieldNames.exists(_.equalsIgnoreCase(n)),
            s"column $n already exists") }
        val incoming = StructType(cols.map { case (n, dt) =>
          org.apache.spark.sql.types.StructField(n, dt, nullable = true) })
        rejectTombstoned(cur, incoming)
        (cur.copy(op = "alter", cdfDir = None, commitTsMs = None,
          schema = StructType(cur.schema.fields ++ incoming.fields)), v + 1)
      }
    }

  /**
   * METADATA-ONLY TYPE WIDENING (`ALTER TABLE … ALTER COLUMN c TYPE t`,
   * Delta's explicit widening form): the column's declared type grows
   * along the lossless [[LakeTable.widensTo]] lattice; NO data file is
   * rewritten at any table size — existing narrow files are served through
   * Spark's parquet widening promotion, later appends may keep landing
   * pre-widen files stay physically narrow (served through the
   * promotion) while new appends CAST UP at write. Requires the
   * `delta.enableTypeWidening` property (Delta's rule). Partition /
   * bloom-indexed / constraint- or generated-referenced / identity columns
   * refuse ([[wideningBlocked]] — their sidecars or expressions are keyed
   * to the physical type). Zone-map stats stay valid: numeric stats
   * compare as numbers, and every widening pair is numeric→numeric.
   * Time travel serves pre-widen versions under their own narrower type;
   * the change feed serves the whole history under the CURRENT type.
   */
  def alterColumnType(colName: String,
      to: org.apache.spark.sql.types.DataType): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      require(wideningOn(cur),
        s"ALTER COLUMN TYPE needs TBLPROPERTIES ('${LakeTable.TypeWideningProp}' " +
          "= 'true') — widening is opt-in (Delta's rule)")
      val f = cur.schema.fields.find(_.name.equalsIgnoreCase(colName))
        .getOrElse(throw new IllegalArgumentException(
          s"no column $colName in ${cur.schema.fieldNames.mkString(",")}"))
      require(f.dataType != to, s"column ${f.name} already has type ${to.simpleString}")
      require(LakeTable.widensTo(f.dataType, to),
        s"${f.dataType.simpleString} → ${to.simpleString} is not a lossless " +
          "widening (supported: byte/short/int→wider integral, " +
          "float→double, byte/short/int→double, integral→decimal(p,0) with " +
          "enough digits, decimal→decimal growing scale and integer capacity)")
      require(!wideningBlocked(cur).contains(f.name),
        s"column ${f.name} is partition/bloom/constraint/generated/identity-" +
          "bound — its physical type is load-bearing and cannot widen")
      // FLOAT→DOUBLE invalidates the column's zone stats: a float's
      // shortest decimal rendering ("0.1") disagrees with its promoted
      // double value (0.10000000149…), so a high-precision predicate
      // could WRONGLY prune a float-era file. Absent stats never prune —
      // drop them (integral widenings are decimal-exact and keep theirs);
      // post-widen appends write double files with double stats.
      val pc = physName(cur, f.name)
      val keptStats =
        if (f.dataType == org.apache.spark.sql.types.FloatType)
          cur.fileStats.map(fs => fs.copy(minMax = fs.minMax - pc))
        else cur.fileStats
      (cur.copy(op = "alter", cdfDir = None, commitTsMs = None,
        schema = StructType(cur.schema.fields.map(x =>
          if (x.name == f.name) x.copy(dataType = to) else x)),
        fileStats = keptStats), v + 1)
    }
  }

  /**
   * METADATA-ONLY RENAME COLUMN (`ALTER TABLE ... RENAME COLUMN a TO b`,
   * Delta's `columnMapping.mode = name` rename): only the LOGICAL name
   * changes — the column's PHYSICAL name (fixed at creation) stays in every
   * data file, so no file is rewritten, O(manifest) at any table size.
   * Zone stats, bloom sidecars and Hive partition dirs are keyed by the
   * physical name and stay valid; partition columns may be renamed. Reads,
   * predicates, MERGE keys and SQL conditions use the new name immediately;
   * [[readVersion]] of pre-rename versions serves the old name; the change
   * feed serves the whole history under the CURRENT names (physical
   * identity makes old versions' rows column-consistent). Renaming a column
   * referenced by a CHECK constraint or a generated-column expression is
   * refused (drop the constraint first — expression strings are not
   * rewritten), as is adopting an existing or tombstoned name.
   */
  def renameColumn(oldName: String, newName: String): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    require(newName.nonEmpty && !newName.contains("."),
      s"bad column name '$newName'")
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      val f = cur.schema.fields.find(_.name.equalsIgnoreCase(oldName))
        .getOrElse(throw new IllegalArgumentException(
          s"no column $oldName in ${cur.schema.fieldNames.mkString(",")}"))
      val c = f.name
      def refs(e: String): Boolean =
        spark.sessionState.sqlParser.parseExpression(e).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.nameParts.head.equalsIgnoreCase(c) => a
        }.nonEmpty
      require(!cur.schema.fieldNames.exists(n => n != c && n.equalsIgnoreCase(newName)),
        s"column $newName already exists")
      require(!cur.droppedCols.exists(_.equalsIgnoreCase(newName)),
        s"$newName is the tombstoned physical name of a dropped column — " +
          "old files still carry its bytes")
      require(!cur.colMap.exists { case (l, ph) =>
        l != c && l != ph && ph.equalsIgnoreCase(newName) },
        s"$newName is the physical name of another renamed column — old " +
          "files still carry its bytes")
      cur.constraints.foreach { case (n, e) => require(!refs(e),
        s"constraint $n references $c — drop the constraint first") }
      cur.generated.foreach { case (g, e) => require(g != c && !refs(e),
        s"generated column $g is defined as '$e' — renames do not rewrite " +
          "expressions; drop the generated column first") }
      val phys = physName(cur, c)
      val newMap = cur.colMap.filterNot(_._1 == c) ++
        (if (phys == newName) Nil else Seq(newName -> phys))
      (cur.copy(op = "rename", cdfDir = None, commitTsMs = None,
        schema = StructType(cur.schema.fields.map(x =>
          if (x.name == c) x.copy(name = newName) else x)),
        pcol = cur.pcol.map(p => if (p == c) newName else p),
        statsCols = cur.statsCols.map(x => if (x == c) newName else x),
        bloomCols = cur.bloomCols.map(x => if (x == c) newName else x),
        colMap = newMap), v + 1)
    }
  }

  /** Current logical → physical column mapping (renamed columns only). */
  def columnMapping: Map[String, String] = manifest.colMap.toMap

  /**
   * `ALTER TABLE ... SET TBLPROPERTIES` (Delta table properties): free-form
   * key/value metadata carried in the manifest, versioned, restored and
   * cloned with the table. `enableChangeFeed` is RECOGNIZED: setting it
   * 'true'/'false' switches change-data capture for subsequent commits
   * (Delta's `delta.enableChangeDataFeed` — the feed is readable from the
   * version that enabled it).
   */
  def setTableProperties(kvs: Map[String, String]): Unit = {
    // reserved namespaces (Delta likewise reserves delta.*): the identity
    // sequence state, column DEFAULTs, and the clustering key are managed
    // by their dedicated DDL — a raw SET could bypass their validation
    // (e.g. a malformed identity spec would MatchError every later append)
    val reserved = kvs.keys.filter(k =>
      k.startsWith(LakeTable.IdentityPropPrefix) ||
        k.startsWith(LakeTable.DefaultPropPrefix) ||
        k == LakeTable.ClusterByProp)
    require(reserved.isEmpty,
      s"table propert${if (reserved.size == 1) "y" else "ies"} " +
        s"${reserved.mkString(", ")} are reserved — use the dedicated DDL " +
        "(IDENTITY at CREATE, ALTER COLUMN SET DEFAULT, ALTER TABLE CLUSTER BY)")
    setTablePropertiesInternal(kvs)
  }

  private def setTablePropertiesInternal(
      kvs: Map[String, String]): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    require(kvs.nonEmpty, "SET TBLPROPERTIES with no properties")
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      val cdf = kvs.get(LakeTable.ChangeFeedProp) match {
        case Some(x) => x.trim.toLowerCase(java.util.Locale.ROOT) == "true"
        case None => cur.cdfEnabled
      }
      val merged = (cur.props.toMap ++ (kvs - LakeTable.ChangeFeedProp))
        .toSeq.sortBy(_._1)
      (cur.copy(op = "properties", cdfDir = None, commitTsMs = None,
        props = merged, cdfEnabled = cdf), v + 1)
    }
  }

  /** `ALTER TABLE ... UNSET TBLPROPERTIES` — absent keys are ignored
   *  (Delta's IF EXISTS semantics). Unsetting `enableChangeFeed` disables
   *  capture for subsequent commits. */
  def unsetTableProperties(keys: Seq[String]): Unit = {
    val reserved = keys.filter(k =>
      k.startsWith(LakeTable.IdentityPropPrefix) ||
        k.startsWith(LakeTable.DefaultPropPrefix) ||
        k == LakeTable.ClusterByProp)
    require(reserved.isEmpty,
      s"table propert${if (reserved.size == 1) "y" else "ies"} " +
        s"${reserved.mkString(", ")} are reserved — use the dedicated DDL " +
        "(ALTER COLUMN DROP DEFAULT, ALTER TABLE CLUSTER BY NONE; " +
        "identity state cannot be unset)")
    unsetTablePropertiesInternal(keys)
  }

  private def unsetTablePropertiesInternal(keys: Seq[String]): Unit = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    require(keys.nonEmpty, "UNSET TBLPROPERTIES with no keys")
    commitWithRetry { () =>
      val v = currentVersion
      val cur = readManifest(v)
      val cdf = if (keys.contains(LakeTable.ChangeFeedProp)) false
        else cur.cdfEnabled
      (cur.copy(op = "properties", cdfDir = None, commitTsMs = None,
        props = cur.props.filterNot(p => keys.contains(p._1)),
        cdfEnabled = cdf), v + 1)
    }
  }

  /** Liquid clustering (Delta `CLUSTER BY` / `ALTER TABLE … CLUSTER BY`):
   *  declare the clustering key as TABLE METADATA instead of baking it
   *  into a directory layout. Data layout changes lazily — `OPTIMIZE`
   *  without an explicit ZORDER re-clusters on these columns (Delta's
   *  incremental-clustering trigger); writes themselves are untouched, so
   *  changing the key is O(manifest) and takes effect at the next
   *  OPTIMIZE. Empty `cols` = `CLUSTER BY NONE` (clears the key).
   *  Partitioned tables are refused — Delta's rule: liquid clustering and
   *  Hive-style partitioning are exclusive layouts. */
  def setClusterBy(cols: Seq[String]): Unit = {
    require(exists, s"LakeTable at $root does not exist")
    if (cols.isEmpty) unsetTablePropertiesInternal(Seq(LakeTable.ClusterByProp))
    else {
      require(partitionColumn.isEmpty,
        "CLUSTER BY on a partitioned table — liquid clustering and " +
          "partitioning are exclusive (Delta's rule)")
      val missing = cols.filterNot(c =>
        schema.fieldNames.exists(_.equalsIgnoreCase(c)))
      require(missing.isEmpty,
        s"CLUSTER BY column(s) not in schema: ${missing.mkString(", ")}")
      require(cols.size <= 4,
        "CLUSTER BY supports at most 4 columns (Delta's limit)")
      // store the schema's CANONICAL spelling: later OPTIMIZE resolves the
      // clustering key case-sensitively, so `CLUSTER BY (O_CUSTKEY)` on a
      // table with o_custkey must not brick every subsequent OPTIMIZE
      val canon = cols.map(c =>
        schema.fieldNames.find(_.equalsIgnoreCase(c)).get)
      setTablePropertiesInternal(Map(LakeTable.ClusterByProp -> canon.mkString(",")))
    }
  }

  /** Current liquid-clustering columns (empty = not clustered). */
  def clusterBy: Seq[String] =
    tableProperties.get(LakeTable.ClusterByProp).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** Current table properties (`SHOW TBLPROPERTIES`), including the
   *  recognized `enableChangeFeed` flag. */
  def tableProperties: Map[String, String] = {
    val m = manifest
    m.props.toMap ++
      (if (m.cdfEnabled) Map(LakeTable.ChangeFeedProp -> "true") else Map.empty)
  }

  /** Reject additive evolution re-using a [[dropColumn]]-tombstoned name:
   *  old files still carry the bytes, so the "new" column would resurrect
   *  stale values. A full rewrite (overwrite/compact) clears tombstones. */
  private def rejectTombstoned(m: Manifest,
      incoming: StructType): Unit = {
    val novel = incoming.fieldNames
      .filterNot(n => m.schema.fieldNames.exists(_.equalsIgnoreCase(n)))
    val hit = novel.filter(n => m.droppedCols.exists(_.equalsIgnoreCase(n)))
    require(hit.isEmpty,
      s"column(s) ${hit.mkString(", ")} were dropped metadata-only — old " +
        "files still carry their bytes and would resurrect stale values; " +
        "rewrite the table (overwrite/compact) before re-adding the name")
    // same hazard through column mapping: a renamed column's PHYSICAL name
    // is still carried by every old file — a new logical column adopting it
    // would read those stale bytes
    val mapped = novel.filter(n =>
      m.colMap.exists { case (l, ph) => l != ph && ph.equalsIgnoreCase(n) })
    require(mapped.isEmpty,
      s"column(s) ${mapped.mkString(", ")} are the physical names of " +
        "renamed columns — old files still carry their bytes; pick a " +
        "different name or rewrite the table (overwrite) first")
  }

  /** Enforce CHECK constraints on an incoming batch: one conjoined pre-pass
   *  (narrow filter, no shuffle); only on failure a per-constraint probe
   *  names the offender. Throws before anything is committed. */
  private def enforceConstraints(df: DataFrame,
      constraints: Seq[(String, String)]): Unit = if (constraints.nonEmpty) {
    val all = constraints.map { case (_, e) => coalesce(expr(e), lit(false)) }
      .reduce(_ && _)
    if (df.filter(!all).limit(1).count() > 0) {
      val offender = constraints.find { case (_, e) =>
        df.filter(!coalesce(expr(e), lit(false))).limit(1).count() > 0 }
      throw new IllegalArgumentException(
        s"CHECK constraint ${offender.map(_._1).getOrElse("?")} " +
          s"(${offender.map(_._2).getOrElse("?")}) violated by the incoming batch")
    }
  }

  /**
   * O8 CHANGE DATA FEED (Delta `readChangeFeed` — the reference names it at
   * `README.md:91` without implementing it): row-level changes committed in
   * versions `[fromVersion, toVersion]`, with Delta's three CDF columns:
   * `_change_type` ∈ {insert, update_preimage, update_postimage},
   * `_commit_version`, and `_commit_timestamp` (the commit's publish
   * wall-clock, stamped into the manifest header at commit time; NULL for
   * manifests written before the field existed — version numbers remain
   * the ordering the engine guarantees).
   *
   *  - `append` commits derive their inserts straight from the appended data
   *    dir — zero write-time overhead (bronze ingest stays O(new data));
   *  - `merge` commits read the change rows the merge materialized under
   *    `_changes/` (requires the table created with `enableChangeFeed`);
   *  - full-rewrite commits (`overwrite`/`compact`) carry no row-level
   *    delta — a range containing one fails loudly (Delta likewise refuses
   *    CDF across non-CDC rewrites rather than fabricating changes).
   */
  def readChangeFeed(fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    require(exists, s"LakeTable at $root does not exist")
    val hi = toVersion.getOrElse(currentVersion)
    require(fromVersion >= 0 && fromVersion <= hi && hi <= currentVersion,
      s"bad change-feed range [$fromVersion, $hi] for table at version $currentVersion")
    val m = manifest
    val feedSchema = m.schema
      .add(ChangeTypeCol, org.apache.spark.sql.types.StringType, nullable = false)
    def insertsFromData(v: Long, mv: Manifest): Option[DataFrame] = {
      val prevDirs: Set[String] =
        if (v == 0) Set.empty else readManifest(v - 1).entries.map(_.dir).toSet
      val added = mv.entries.map(_.dir).filterNot(prevDirs)
      added.foreach(d => require(Files.isDirectory(Paths.get(root, d)),
        s"change feed for v$v has been vacuumed ($d)"))
      added.map { d =>
        // files carry PHYSICAL names; serve the feed under the CURRENT
        // logical names (physical ids are stable across renames, so a
        // feed spanning a RENAME COLUMN stays column-consistent)
        toLogicalNames(m, spark.read.schema(physSchema(m))
          .option("basePath", s"$root/$d").parquet(s"$root/$d"))
          .withColumn(ChangeTypeCol, lit("insert"))
      }.reduceOption(_ unionByName _)
    }
    val parts = (fromVersion to hi).flatMap { v =>
      val mv = readManifest(v)
      val part: Option[DataFrame] = mv.op match {
        case "create" | "constraint" | "index" | "alter" | "rename" |
             "properties" => None // metadata-only
        case "optimize" | "compact" => None // rowset-preserving maintenance:
          // bin-pack/Z-order rewrite FILES, never logical rows (deletes the
          // pass materializes were already emitted by their own commits) —
          // Delta's CDF likewise skips OPTIMIZE. Auto-compact (property-
          // driven) makes these commits routine inside append streams.
        case "append" | "convert" => // convert's adopted files ARE its inserts
          insertsFromData(v, mv)
        case "merge" | "delete" | "update" | "replace" =>
          mv.cdfDir match {
            // an all-insert commit (bootstrap merge) records no image dir:
            // its added data files ARE its inserts, exactly like append —
            // materializing them again under _changes would write every
            // row twice
            case Some(LakeTable.CdfFromData) => insertsFromData(v, mv)
            case Some(d) =>
              require(Files.isDirectory(Paths.get(root, d)),
                s"change feed for v$v has been vacuumed ($d)")
              val physFeed = physSchema(m)
                .add(ChangeTypeCol, org.apache.spark.sql.types.StringType,
                  nullable = false)
              Some(toLogicalNames(m,
                spark.read.schema(physFeed).parquet(s"$root/$d")))
            case None if mv.op == "replace" && !mv.cdfEnabled => sys.error(
              s"no change data recorded for replace at v$v — create the " +
                "table with enableChangeFeed=true first")
            case None if mv.op == "replace" => sys.error(
              s"replace at v$v predates change-feed images — unreadable range")
            case None if mv.op != "merge" && !mv.cdfEnabled => sys.error(
              s"no change data recorded for ${mv.op} at v$v — create the " +
                "table with enableChangeFeed=true first")
            case None if mv.op != "merge" => None // CDF on, zero rows matched
            case None => sys.error(
              s"no change data recorded for merge at v$v — create the table " +
                "with enableChangeFeed=true before merging")
          }
        case other => sys.error(
          s"change feed unavailable across full-rewrite commit v$v (op=$other)")
      }
      val commitTs = mv.commitTsMs
        .map(ms => lit(new java.sql.Timestamp(ms)))
        .getOrElse(lit(null)).cast("timestamp")
      part.map(_.withColumn(CommitVersionCol, lit(v))
        .withColumn(CommitTimestampCol, commitTs))
    }
    val outSchema = feedSchema
      .add(CommitVersionCol, org.apache.spark.sql.types.LongType, nullable = false)
      .add(CommitTimestampCol, org.apache.spark.sql.types.TimestampType)
    // Serve the whole range under the LATEST schema (Delta's contract for
    // CDF across additive evolution): parts committed before a mergeSchema
    // append are projected to the current feed schema with NULLs for the
    // columns that didn't exist yet, instead of failing the union.
    def conform(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(outSchema.fields.toIndexedSeq.map { f =>
        if (have(f.name)) col(f.name) else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }
    parts.map(conform).reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema))
  }

  /** Whether the change feed can serve versions `[fromVersion, toVersion]`
   *  — false when the window contains a full-rewrite commit (`overwrite` /
   *  `truncate`: no row-level delta exists) or a row-mutating commit with
   *  no recorded images (merge/replace without CDF) — or when VACUUM has
   *  reclaimed the window's change/data dirs. A metadata-only probe
   *  (O(window) manifest reads + dir-existence stats, no data touched).
   *  Incremental consumers
   *  use it to FALL BACK (re-bootstrap from the current snapshot, or
   *  snapshot-refresh) instead of failing every subsequent run when an
   *  upstream table was refreshed by full rewrite — without it, a ledger
   *  window spanning the rewrite wedges the consumer permanently. */
  def feedReadable(fromVersion: Long, toVersion: Long): Boolean = {
    require(exists, s"LakeTable at $root does not exist")
    fromVersion >= 0 && toVersion <= currentVersion &&
      (fromVersion to toVersion).forall { v =>
        val mv = readManifest(v)
        mv.op match {
          case "create" | "constraint" | "index" | "alter" | "rename" |
               "properties" | "optimize" | "compact" =>
            true
          case "append" | "convert" =>
            // VACUUM may have reclaimed this window's added dirs (a lagging
            // consumer under an aggressive retention): unreadable → the
            // consumer falls back to re-bootstrap instead of wedging on
            // readChangeFeed's vacuumed-range error every subsequent run
            val prevDirs: Set[String] =
              if (v == 0) Set.empty
              else readManifest(v - 1).entries.map(_.dir).toSet
            mv.entries.map(_.dir).filterNot(prevDirs)
              .forall(d => Files.isDirectory(Paths.get(root, d)))
          case "merge" | "delete" | "update" | "replace" =>
            // mirror readChangeFeed: images recorded (and still on disk —
            // same vacuum consideration), an all-insert commit served from
            // its added data dirs, or a CDF-on delete/update that matched
            // zero rows (legal empty part)
            (if (mv.cdfDir.contains(LakeTable.CdfFromData)) {
              val prevDirs: Set[String] =
                if (v == 0) Set.empty
                else readManifest(v - 1).entries.map(_.dir).toSet
              mv.entries.map(_.dir).filterNot(prevDirs)
                .forall(d => Files.isDirectory(Paths.get(root, d)))
            } else mv.cdfDir.exists(d => Files.isDirectory(Paths.get(root, d)))) ||
              (mv.cdfDir.isEmpty && mv.cdfEnabled &&
                (mv.op == "delete" || mv.op == "update"))
          case _ => false // overwrite and any other full-rewrite op
        }
      }
  }

  /** Whether every commit in `[fromVersion, toVersion]` is STRUCTURALLY
   *  append-only (append/convert plus metadata-only and rowset-preserving
   *  maintenance commits): such a window's change feed carries ONLY insert
   *  images, so an append-only consumer can skip the update/delete data
   *  probe entirely — a manifest-only check, zero data scanned. The common
   *  100 TB shape (bronze ingest windows) takes this fast path every run;
   *  only windows containing row-mutating commits (merge/delete/update/
   *  replace — which MAY still be all-insert) need a data-level probe. */
  def appendOnlyOps(fromVersion: Long, toVersion: Long): Boolean = {
    require(exists, s"LakeTable at $root does not exist")
    fromVersion >= 0 && toVersion <= currentVersion &&
      (fromVersion to toVersion).forall { v =>
        readManifest(v).op match {
          case "create" | "constraint" | "index" | "alter" | "rename" |
               "properties" | "optimize" | "compact" | "append" | "convert" =>
            true
          case _ => false
        }
      }
  }

  /** Partition-pruned read of only the given partition values. */
  def readPartitions(values: Seq[String]): DataFrame =
    readScoped(manifest, Some(values.toSet))

  /**
   * DATA-SKIPPING read (Delta's stats-based file pruning rebuilt on the
   * manifest): whole files whose zone map proves no row can satisfy the
   * conjunction of `preds` are dropped BEFORE Spark plans the scan, so at
   * 100 TB a narrow time/key range touches only the files that can hold it —
   * the scan cost tracks the selectivity, not the table size. The residual
   * predicate is still applied row-level (zone maps are necessary, never
   * sufficient), so the result equals `read.filter(...)` exactly. Files
   * without recorded stats (table created without `statsColumns`, or a
   * column all-NULL in the file) are always read — skipping is only ever an
   * optimization, never a filter.
   */
  def readWhere(preds: Seq[ZonePred], asOf: Option[Long] = None): DataFrame = {
    val m = asOf.fold(manifest)(readManifest)
    preds.foreach(p => require(m.schema.fieldNames.contains(p.col),
      s"unknown predicate column ${p.col}"))
    def residual(df: DataFrame): DataFrame =
      preds.foldLeft(df) { (d, pr) =>
        val dt = m.schema(pr.col).dataType
        val conds = pr.lo.map(v => col(pr.col) >= lit(v).cast(dt)).toSeq ++
          pr.hi.map(v => col(pr.col) <= lit(v).cast(dt)).toSeq
        conds.foldLeft(d)(_ filter _)
      }
    def empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], m.schema)
    val scans = planSkip(m, preds).flatMap { case (e, kept, _) =>
      // a partitioned dir that owns no partition values is invisible
      val disowned = m.pcol.isDefined && e.owned.exists(_.isEmpty)
      if (kept.isEmpty || disowned) None
      else {
        val scanP = spark.read.schema(physSchema(m))
          .option("basePath", s"$root/${e.dir}")
          .parquet(kept.map(f => s"$root/$f"): _*)
        // zone maps stay sound under deletion vectors (they only remove
        // rows), but the surviving files must still drop their dead rows
        val scan = toLogicalNames(m,
          if (m.deleteVectors.isEmpty) scanP else rowIdCols(scanP))
        // partitioned dirs still honor manifest ownership (a dir keeps files
        // for partitions it no longer owns until vacuum)
        val ownedFiltered = (m.pcol, e.owned) match {
          case (Some(p), Some(vs)) if vs.nonEmpty =>
            val dt = m.schema(p).dataType
            scan.filter(vs.map(v => col(p) === lit(v).cast(dt)).reduce(_ || _))
          case _ => scan
        }
        Some(residual(ownedFiltered))
      }
    }
    if (scans.isEmpty) empty
    else antiJoinDeleteVectors(scans.reduce(_ unionByName _), m)
      .select(m.schema.fieldNames.map(col).toSeq: _*)
  }

  /** Introspection for [[readWhere]]: (files read, files skipped) under the
   *  given predicates — the observability hook specs and operators use to
   *  prove skipping actually happens. */
  def skippingStats(preds: Seq[ZonePred]): (Int, Int) = {
    val plan = planSkip(manifest, preds)
    val kept = plan.map(_._2.size).sum
    val total = plan.map(_._3).sum
    (kept, total - kept)
  }

  /** Per dir-entry: (entry, kept root-relative files, total files).
   *  Zone maps prune range predicates; the bloom index additionally prunes
   *  EQUALITY predicates on indexed columns (both necessary conditions —
   *  a file survives only if every pred admits it; missing stats/sidecars
   *  admit everything). */
  private def planSkip(m: Manifest,
      preds0: Seq[ZonePred]): Seq[(DirEntry, Seq[String], Int)] = {
    // callers pass LOGICAL predicate columns; per-file stats, bloom sidecar
    // keys and Hive dir names are all PHYSICAL — translate once here
    val bloomPhys = m.bloomCols.map(physName(m, _))
    val preds = toPhysicalPreds(m, preds0)
    val statByPath = m.fileStats.map(fs => fs.path -> fs.minMax).toMap
    val eqPreds = preds.filter(p =>
      p.lo.isDefined && p.lo == p.hi && bloomPhys.contains(p.col))
    // Hive-layout pruning: an EQUALITY pred on the partition column drops
    // files of other partitions by their `p=value` subpath (the partition
    // column has no zone stats — its value IS the directory name)
    val pcolEq = m.pcol.map(physName(m, _)).toSeq.flatMap(pc => preds.collect {
      case pr if pr.col == pc && pr.lo.isDefined && pr.lo == pr.hi => pr.lo.get
    })
    m.entries.map { e =>
      val blooms = if (eqPreds.isEmpty) Map.empty[String,
        Map[String, org.apache.spark.util.sketch.BloomFilter]]
      else readBloomIndex(e.dir)
      val all = listParquet(Paths.get(root, e.dir))
        .map(p => Paths.get(root).relativize(p).toString).sorted
      val kept = all.filter { f =>
        statByPath.get(f).forall { mm =>
          preds.forall(pr => mayMatch(mm, pr, physSchema(m)))
        } && eqPreds.forall { pr =>
          blooms.get(f).flatMap(_.get(pr.col))
            .forall(_.mightContainString(pr.lo.get))
        } && (pcolEq.isEmpty || m.pcol.map(physName(m, _)).forall { pc =>
          val sub = Paths.get(e.dir).relativize(Paths.get(f)).toString
          partitionValueOf(sub, pc).forall(v => pcolEq.forall(_ == v))
        })
      }
      (e, kept, all.size)
    }
  }

  /** Candidate-file plan for a FILE-PRUNED unpartitioned merge, or None
   *  when the path doesn't apply. The source's per-key [min, max] (rendered
   *  through the same canonical CAST-to-string both zone stats use) becomes
   *  one [[ZonePred]] per stats-carrying key; [[planSkip]] then names which
   *  files may hold a matching row. Gates:
   *   - at least one merge key must carry zone stats of a type whose
   *     rendering orders correctly under [[mayMatch]] (numerics compare as
   *     BigDecimal; strings/dates lexicographically — timestamps are
   *     excluded, their trimmed-fraction rendering does not);
   *   - the table must be big enough that one bounds aggregation over the
   *     source beats a blind full rewrite
   *     (`spark.graft.merge.pruneMinBytes`, default 64 MB — derived from
   *     data size, never from the local core count);
   *   - under null-safe key matching a NULL source key matches NULL target
   *     rows, which zone stats do not describe — bail;
   *   - a plan that touches every file anyway returns None (the caller's
   *     full-rewrite path skips the relink machinery). */
  private def mergePrunePlan(m: Manifest, src: DataFrame, keys: Seq[String],
      nullSafeKeys: Boolean): Option[Seq[(DirEntry, Seq[String], Int)]] = {
    import org.apache.spark.sql.types._
    def prunable(dt: DataType): Boolean = dt match {
      case _: NumericType | StringType | DateType => true
      case _ => false
    }
    val statKeys = keys.filter(k => m.statsCols.contains(k) &&
      prunable(m.schema(k).dataType))
    if (statKeys.isEmpty) return None
    val totalBytes = m.entries.iterator.flatMap(e =>
      listParquet(Paths.get(root, e.dir))).map(Files.size(_)).sum
    if (totalBytes < LakeTable.mergePruneMinBytes(spark)) return None
    val aggs = statKeys.flatMap { k =>
      Seq(min(col(k)).cast("string").as(s"__lo_$k"),
        max(col(k)).cast("string").as(s"__hi_$k")) ++
      (if (nullSafeKeys) Seq(max(col(k).isNull.cast("int")).as(s"__nul_$k"))
       else Nil)
    }
    val r = src.agg(aggs.head, aggs.tail: _*).head()
    if (nullSafeKeys && statKeys.exists { k =>
        val i = r.fieldIndex(s"__nul_$k"); !r.isNullAt(i) && r.getInt(i) == 1 })
      return None
    val preds = statKeys.flatMap { k =>
      val lo = r.fieldIndex(s"__lo_$k"); val hi = r.fieldIndex(s"__hi_$k")
      if (r.isNullAt(lo) || r.isNullAt(hi)) None // empty/all-null source key
      else Some(ZonePred(k, Some(r.getString(lo)), Some(r.getString(hi))))
    }
    if (preds.isEmpty) return None
    val plan = planSkip(m, preds)
    if (plan.map(_._2.size).sum >= plan.map(_._3).sum) None else Some(plan)
  }

  /** Can a file with zone map `mm` contain a row satisfying `pr`? Missing
   *  stats keep the file; comparisons are numeric for numeric columns and
   *  lexicographic otherwise (Spark's fixed-width timestamp/date renderings
   *  order correctly as strings). Unparseable values never prune. */
  private def mayMatch(mm: Map[String, (String, String)], pr: ZonePred,
      schema: StructType): Boolean =
    mm.get(pr.col).forall { case (mn, mx) =>
      val numeric = schema(pr.col).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      def cmp(a: String, b: String): Int =
        if (!numeric) a.compareTo(b)
        else try { BigDecimal(a).compare(BigDecimal(b)) }
        catch { case _: NumberFormatException => 0 } // can't prove → keep
      val aboveMax = pr.lo.exists(l => cmp(l, mx) > 0)
      val belowMin = pr.hi.exists(h => cmp(h, mn) < 0)
      !aboveMax && !belowMin
    }

  // ---- COLUMN-MAPPING translation boundary --------------------------------
  //
  // With a non-empty colMap, parquet files carry PHYSICAL column names while
  // every API surface (schema, predicates, conditions, constraints,
  // generated expressions) speaks LOGICAL names. These helpers are the ONLY
  // translation points: file reads force the physical schema and rename to
  // logical immediately; file writes rename to physical just before
  // `.write.parquet`. Per-file artifacts (zone stats, bloom sidecars, Hive
  // partition dirs) describe physical files and stay keyed physical, so a
  // rename can never invalidate them. Empty colMap ⇒ every helper is the
  // identity.

  /** Logical → physical column name (identity when unmapped). */
  private def physName(m: Manifest, c: String): String =
    m.colMap.collectFirst { case (l, p) if l == c => p }.getOrElse(c)

  /** The manifest schema with physical field names — what the files carry. */
  private def physSchema(m: Manifest): StructType =
    if (m.colMap.isEmpty) m.schema
    else StructType(m.schema.fields.map(f => f.copy(name = physName(m, f.name))))

  /** Rename a logical-space frame to physical names (write-side boundary). */
  private def toPhysicalNames(m: Manifest, df: DataFrame): DataFrame =
    if (m.colMap.isEmpty) df else df.withColumnsRenamed(m.colMap.toMap)

  /** Rename a physical-space frame to logical names (read-side boundary).
   *  Columns outside the map (row-id/_change_type helpers) pass through. */
  private def toLogicalNames(m: Manifest, df: DataFrame): DataFrame =
    if (m.colMap.isEmpty) df
    else df.withColumnsRenamed(m.colMap.map { case (l, p) => p -> l }.toMap)

  /** Zone predicates translated onto physical column names, for consulting
   *  per-file stats/bloom sidecars and Hive partition dir names. */
  private def toPhysicalPreds(m: Manifest, preds: Seq[ZonePred]): Seq[ZonePred] =
    if (m.colMap.isEmpty) preds
    else preds.map(pr => pr.copy(col = physName(m, pr.col)))

  private def readScoped(m: Manifest, scope: Option[Set[String]]): DataFrame =
    readScopedRows(m, scope, withRowIds = false)
      .select(m.schema.fieldNames.map(col).toSeq: _*)

  /** Root-relative path + in-file row index of every scanned row — the
   *  coordinates deletion vectors address rows by. Hadoop renders
   *  `_metadata.file_path` as `file:` + absolute path (single slash). */
  private def rowIdCols(df: DataFrame): DataFrame = {
    val prefix = "file:" + Paths.get(root).toAbsolutePath.normalize.toString + "/"
    df.withColumn(DvFileCol,
        expr(s"substring(_metadata.file_path, ${prefix.length + 1})"))
      .withColumn(DvPosCol, col("_metadata.row_index"))
  }

  /** Snapshot rows of `m` (optionally partition-scoped), with logically
   *  deleted rows anti-joined out against the manifest's deletion vectors.
   *  `withRowIds = true` keeps [[DvFileCol]]/[[DvPosCol]] on the output
   *  (the merge-on-read DELETE write path needs the coordinates); callers
   *  re-project to `m.schema` either way. The DV side is broadcast: it is
   *  sized by deleted-row count, not table size — tables accumulating
   *  large vectors compact (which materializes and clears them). */
  private def readScopedRows(m: Manifest, scope: Option[Set[String]],
      withRowIds: Boolean): DataFrame = {
    def empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], m.schema)
    val needIds = withRowIds || m.deleteVectors.nonEmpty
    def attach(df: DataFrame): DataFrame = if (needIds) rowIdCols(df) else df
    val base: Option[DataFrame] = m.pcol match {
      case None =>
        if (m.entries.isEmpty) None
        else Some(toLogicalNames(m, attach(spark.read.schema(physSchema(m))
          .parquet(m.entries.map(e => s"$root/${e.dir}"): _*))))
      case Some(p) =>
        val dt = m.schema(p).dataType
        val pp = physName(m, p) // Hive dirs are named with the physical pcol
        val scans = m.entries.flatMap { e =>
          val owned = e.owned.getOrElse(Nil)
          val visible = scope.fold(owned)(s => owned.filter(s))
          if (visible.isEmpty) None
          else Some(toLogicalNames(m, attach(
            spark.read.schema(physSchema(m))
              .option("basePath", s"$root/${e.dir}")
              .parquet(s"$root/${e.dir}"))
              // equality OR-chain on the partition column → Spark prunes
              // non-owned subdirectories at planning time
              .filter(visible.map(v => col(pp) === lit(v).cast(dt)).reduce(_ || _))))
        }
        scans.reduceOption(_ unionByName _)
    }
    base match {
      case None =>
        if (withRowIds)
          empty.withColumn(DvFileCol, lit(null).cast("string"))
            .withColumn(DvPosCol, lit(null).cast("long"))
        else empty
      case Some(df) => antiJoinDeleteVectors(df, m)
    }
  }

  /** Filter logically deleted rows out of a scan carrying row-id columns. */
  private def antiJoinDeleteVectors(df: DataFrame, m: Manifest): DataFrame =
    if (m.deleteVectors.isEmpty) df
    else {
      val dv = spark.read.schema(DvSchema)
        .parquet(m.deleteVectors.map(d => s"$root/$d"): _*)
      df.join(broadcast(dv),
        df(DvFileCol) === dv("file") && df(DvPosCol) === dv("pos"), "left_anti")
    }

  /** Streaming tail of an APPEND-ONLY table (SURVEY §2.1/S4 — the
   *  `readStream.format("delta")` equivalent): a Structured Streaming file
   *  source over the table's data directories. Each `append` lands new
   *  parquet files, which the file-listing checkpoint picks up exactly once.
   *  Sound only for append-only tables (bronze) — merge/overwrite rewrite
   *  files, which a file stream must never tail. ENFORCED: refuses any table
   *  whose commit history contains a non-append operation (the guard Delta
   *  implements as `ignoreChanges`-less streaming reads). */
  def readStream: DataFrame = {
    require(exists, s"LakeTable at $root does not exist")
    // metadata-only commits (create/constraint/index/alter) touch no data
    // files — safe: the stream plans with the CURRENT schema, so files
    // predating an ADD COLUMNS serve NULL and dropped columns project away
    val unsafe = history.filterNot { case (_, op) =>
      op == "create" || op == "append" || op == "constraint" ||
        op == "index" || op == "alter" || op == "convert" ||
        op == "rename" || op == "properties" }
    // the one self-inflicted way to break this contract: TBLPROPERTIES
    // autoCompact='true' makes APPENDS commit optimize rewrites, so the
    // property and a file-glob stream are mutually exclusive on one table —
    // name the property in the error or the failure looks like a mystery
    // (the user only ever appended)
    val autoCompactHint =
      if (unsafe.exists(_._2 == "optimize") && manifest.props.exists { case (k, v) =>
          k == LakeTable.AutoCompactProp && v.trim.equalsIgnoreCase("true") })
        s" (this table has TBLPROPERTIES ${LakeTable.AutoCompactProp}='true': " +
          "appends themselves commit compaction rewrites — unset it, or " +
          "stream a separate non-compacting bronze table and OPTIMIZE downstream)"
      else ""
    require(unsafe.isEmpty,
      s"readStream requires an append-only history, but $root has non-append commits: " +
        unsafe.map { case (v, op) => s"v$v=$op" }.mkString(", ") +
        " — rewritten files would replay as duplicates in a file stream" +
        autoCompactHint)
    // Partitioned tables store the partition column in the Hive directory
    // layout, not in the parquet files; the glob file stream below has no
    // per-dir basePath, so that column would silently come back all-NULL.
    val m = manifest
    require(m.pcol.isEmpty,
      s"readStream does not support partitioned tables ($root is " +
        s"partitioned by ${m.pcol.get}): the file-stream glob " +
        "cannot materialize Hive-layout partition values — stream the " +
        "unpartitioned bronze table and partition downstream")
    // files carry PHYSICAL names: plan the stream with the physical
    // schema and rename to the logical view (a rename mid-stream is safe —
    // physical names never change, so the file source's schema is stable)
    toLogicalNames(m, spark.readStream.schema(physSchema(m))
      .option("maxFilesPerTrigger", "1000")
      .parquet(s"$root/data/*"))
  }

  /** Conditional put of manifest `m` as version `next`: stage to a temp
   *  file, hard-link it to the manifest path — atomic, and EEXIST if another
   *  writer already committed `next`. Returns whether this writer won. */
  private def dirLine(prefix: String, e: DirEntry): String = {
    val ownedPart = e.owned.map(_.map(b64e).mkString(",")).getOrElse("")
    if (e.clustered) s"$prefix${e.dir}|$ownedPart|c"
    else e.owned match {
      case None => s"$prefix${e.dir}"
      case Some(_) => s"$prefix${e.dir}|$ownedPart"
    }
  }

  private def fstatLine(fs: FileStat): String =
    (b64e(fs.path) +: fs.minMax.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
      s"${b64e(c)}:${b64e(mn)}:${b64e(mx)}"
    }).mkString("fstat=", "|", "")

  /** Delta-encode `m`'s O(files) body against its parent, or None when a
   *  full checkpoint is due: v0, every
   *  [[LakeTable.ManifestCheckpointInterval]]th commit in a chain, a parent
   *  that can't be read, a diff no smaller than the full body
   *  (overwrite/compact-class rewrites), or — the safety net — a diff whose
   *  in-memory resolution does not reproduce `m` exactly. */
  private def deltaBodyFor(m: Manifest, next: Long,
      fullBody: Seq[String]): Option[Seq[String]] = {
    if (next == 0) return None
    val pv = next - 1
    if (!Files.exists(manifestFile(pv))) return None
    val chain = chainLenOf(pv)
    if (chain + 1 >= LakeTable.ManifestCheckpointInterval) return None
    val parent = try readManifest(pv) catch { case scala.util.control.NonFatal(_) => return None }
    val parentDirs = parent.entries.map(e => e.dir -> e).toMap
    val newDirs = m.entries.map(e => e.dir -> e).toMap
    val rm = parent.entries.filterNot(e => newDirs.get(e.dir).contains(e)).map(_.dir)
    val add = m.entries.filterNot(e => parentDirs.get(e.dir).contains(e))
    val parentStats = parent.fileStats.map(f => f.path -> f).toMap
    val addStats = m.fileStats.filterNot(f => parentStats.get(f.path).contains(f))
    // verify: the reader's resolution of this diff must reproduce m exactly
    val rmSet = rm.toSet
    val addPaths = addStats.map(_.path).toSet
    val resolvedEntries = parent.entries.filterNot(e => rmSet(e.dir)) ++ add
    val resolvedStats = parent.fileStats.filterNot(f =>
      addPaths(f.path) || rmSet.exists(d => f.path.startsWith(d + "/"))) ++ addStats
    if (resolvedEntries.toSet != m.entries.toSet ||
        resolvedStats.toSet != m.fileStats.toSet) return None
    val delta = Seq(s"base=$pv", s"chain=${chain + 1}") ++
      rm.map(d => s"rmdir=$d") ++
      add.map(dirLine("adddir=", _)) ++
      addStats.map(fstatLine)
    if (delta.size >= fullBody.size + 2) None else Some(delta)
  }

  /** Publish `m` as version `next` via hard-link CAS. The manifest LOG uses
   *  Delta Lake's discipline (delta log + `delta.checkpointInterval`-style
   *  checkpoints, default 10): between checkpoints a commit records only the
   *  dirs/file-stats it added or removed, so a one-file append to a
   *  million-file table writes O(new files) manifest bytes, not O(table) —
   *  the shape that keeps per-commit metadata cost flat at 100 TB. Readers
   *  resolve at most one checkpoint + interval-1 deltas per snapshot load. */
  private def tryCommit(m: Manifest, next: Long): Boolean = {
    Files.createDirectories(commitsDir)
    val header = Seq(s"schema=${b64e(m.schema.toDDL)}", s"op=${m.op}",
      s"ts=${clock()}") ++
      m.pcol.map(p => s"pcol=$p").toSeq ++
      (if (m.cdfEnabled) Seq("cdf=on") else Nil) ++
      m.cdfDir.map(d => s"cdfdir=$d").toSeq ++
      (if (m.statsCols.nonEmpty)
        Seq(s"statscols=${m.statsCols.map(b64e).mkString(",")}") else Nil) ++
      m.constraints.sortBy(_._1).map { case (n, e) => s"check=${b64e(n)}:${b64e(e)}" } ++
      m.generated.sortBy(_._1).map { case (n, e) => s"gen=${b64e(n)}:${b64e(e)}" } ++
      m.deleteVectors.map(d => s"dv=$d") ++
      (if (m.bloomCols.nonEmpty)
        Seq(s"bloomcols=${m.bloomCols.map(b64e).mkString(",")}") else Nil) ++
      m.txns.sortBy(_._1).map { case (a, tv) => s"txn=${b64e(a)}:$tv" } ++
      (if (m.droppedCols.nonEmpty)
        Seq(s"dropped=${m.droppedCols.map(b64e).mkString(",")}") else Nil) ++
      (if (m.colMap.nonEmpty)
        Seq(s"colmap=${m.colMap.sortBy(_._1).map { case (l, p) =>
          s"${b64e(l)}:${b64e(p)}" }.mkString(",")}") else Nil) ++
      m.props.sortBy(_._1).map { case (k, v) => s"prop=${b64e(k)}:${b64e(v)}" } ++
      (if (m.clusterKey.nonEmpty)
        Seq(s"ckey=${m.clusterKey.map(b64e).mkString(",")}") else Nil)
    val fullBody = m.entries.map(dirLine("dir=", _)) ++ m.fileStats.map(fstatLine)
    val lines = deltaBodyFor(m, next, fullBody) match {
      // base=/chain= lead the file so chain-depth probes read 2 lines only
      case Some(delta) => delta.take(2) ++ header ++ delta.drop(2)
      case None => header ++ fullBody
    }
    val staged = commitsDir.resolve(s".stage-${UUID.randomUUID()}")
    Files.write(staged, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val won =
      try { Files.createLink(manifestFile(next), staged); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(staged)
    if (won) {
      // refresh the pointer cache (stale/regressed values are harmless:
      // currentVersion probes forward past them)
      val tmp = Paths.get(root, s"_VERSION.tmp.${UUID.randomUUID()}")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    won
  }

  /** Commit on top of whatever the current version is, retrying lost races —
   *  sound only when `mkManifest` re-derives the manifest from the LATEST
   *  snapshot on each attempt (append/overwrite). */
  private def commitWithRetry(mkManifest: () => (Manifest, Long)): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      val (m, next) = mkManifest()
      done = tryCommit(m, next)
      attempts += 1
      if (!done && attempts >= 100)
        throw new ConcurrentWriteException(
          s"lost $attempts consecutive commit races at $root")
    }
  }

  /** Create an empty table (idempotent). `partitionBy` fixes the partition
   *  column for the table's lifetime; `enableChangeFeed` turns on O8 change
   *  data capture — every later MERGE materializes its row-level changes for
   *  [[readChangeFeed]] (appends derive their inserts for free). */
  def create(schema: StructType, partitionBy: Option[String] = None,
      enableChangeFeed: Boolean = false,
      statsColumns: Seq[String] = Nil,
      generatedColumns: Map[String, String] = Map.empty,
      bloomFilterColumns: Seq[String] = Nil,
      identityColumns: Map[String, (Long, Long)] = Map.empty,
      defaultValues: Map[String, String] = Map.empty): LakeTable = {
    if (!exists) {
      partitionBy.foreach(p => require(schema.fieldNames.contains(p),
        s"partition column $p not in schema"))
      statsColumns.foreach(c => require(schema.fieldNames.contains(c),
        s"stats column $c not in schema"))
      bloomFilterColumns.foreach(c => require(schema.fieldNames.contains(c),
        s"bloom filter column $c not in schema"))
      generatedColumns.keys.foreach(c => require(schema.fieldNames.contains(c),
        s"generated column $c not in schema"))
      identityColumns.foreach { case (c, (_, step)) =>
        require(schema.fieldNames.contains(c), s"identity column $c not in schema")
        require(schema(c).dataType == org.apache.spark.sql.types.LongType,
          s"identity column $c must be BIGINT")
        require(step != 0, s"identity column $c: step must be non-zero")
        require(!generatedColumns.contains(c),
          s"$c cannot be both identity and generated")
      }
      defaultValues.keys.foreach { c =>
        require(schema.fieldNames.contains(c), s"DEFAULT column $c not in schema")
        require(!generatedColumns.contains(c) && !identityColumns.contains(c),
          s"$c cannot carry a DEFAULT and be generated/identity")
      }
      // the sequence state rides the property map: spec + high-water
      // (hw starts one step BEFORE start so the first assigned id = start)
      val identProps = identityColumns.toSeq.sortBy(_._1).flatMap {
        case (c, (s0, st)) => Seq(
          s"${LakeTable.IdentityPropPrefix}$c" -> s"$s0,$st",
          s"${LakeTable.IdentityPropPrefix}$c.hw" -> (s0 - st).toString)
      } ++ defaultValues.toSeq.sortBy(_._1).map { case (c, e) =>
        s"${LakeTable.DefaultPropPrefix}$c" -> e
      }
      Files.createDirectories(Paths.get(root))
      // idempotent: losing the v0 race means someone else created the table
      tryCommit(Manifest(schema, partitionBy, Nil, "create",
        cdfEnabled = enableChangeFeed,
        statsCols = statsColumns.filterNot(partitionBy.contains),
        generated = generatedColumns.toSeq.sortBy(_._1),
        bloomCols = bloomFilterColumns.filterNot(partitionBy.contains),
        props = identProps), 0L)
    }
    this
  }

  /** Declared IDENTITY columns: name → (start, step). */
  def identityColumns: Map[String, (Long, Long)] =
    identitySpecsOf(manifest)

  /** `ALTER TABLE … ALTER COLUMN c SET DEFAULT <expr>` — metadata-only
   *  (one properties commit); applies to subsequent named-column INSERTs
   *  that omit the column. */
  def setDefaultValue(c: String, e: String): Unit = {
    require(schema.fieldNames.contains(c), s"unknown column $c")
    require(!generatedColumns.contains(c) && !identityColumns.contains(c),
      s"$c cannot carry a DEFAULT and be generated/identity")
    setTablePropertiesInternal(Map(s"${LakeTable.DefaultPropPrefix}$c" -> e))
  }

  /** `ALTER TABLE … ALTER COLUMN c DROP DEFAULT` (absent default = no-op,
   *  Delta's semantics). */
  def dropDefaultValue(c: String): Unit = {
    require(schema.fieldNames.contains(c), s"unknown column $c")
    unsetTablePropertiesInternal(Seq(s"${LakeTable.DefaultPropPrefix}$c"))
  }

  /** Declared column DEFAULTs: name → expression SQL. */
  def defaultValues: Map[String, String] =
    manifest.props.collect {
      case (k, v) if k.startsWith(LakeTable.DefaultPropPrefix) =>
        k.stripPrefix(LakeTable.DefaultPropPrefix) -> v
    }.toMap

  private def identitySpecsOf(m: Manifest): Map[String, (Long, Long)] =
    m.props.collect {
      case (k, v) if k.startsWith(LakeTable.IdentityPropPrefix) &&
          !k.endsWith(".hw") =>
        val Array(s0, st) = v.split(',')
        k.stripPrefix(LakeTable.IdentityPropPrefix) -> (s0.toLong, st.toLong)
    }.toMap

  private def identityHw(m: Manifest, c: String): Long = {
    val (s0, st) = identitySpecsOf(m)(c)
    m.props.toMap.get(s"${LakeTable.IdentityPropPrefix}$c.hw")
      .map(_.toLong).getOrElse(s0 - st)
  }

  /** Assign dense identity values above `hw`: ONE counting pass for
   *  per-partition offsets, then a narrow map — no global sort, no
   *  single-partition funnel at any batch size. Values are
   *  hw + step·(global position); returns the frame (original column
   *  order), the new high-water per column, and the PINNED input RDD.
   *  Pinning matters for correctness, not just speed: the counting pass
   *  and the physical write are two jobs over the same lineage — a
   *  nondeterministic upstream (shuffled sample, rand()) could otherwise
   *  change partition contents between them, silently duplicating or
   *  skipping ids. The caller unpersists after the append commits. */
  private def assignIdentities(df: DataFrame, tableSchema: StructType,
      specs: Map[String, (Long, Long)],
      hw: Map[String, Long])
      : (DataFrame, Map[String, Long], org.apache.spark.rdd.RDD[Row]) = {
    import org.apache.spark.sql.Row
    specs.keys.foreach(c => require(!df.columns.contains(c),
      s"identity column $c is GENERATED ALWAYS — it cannot be supplied"))
    val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd.mapPartitionsWithIndex((i, it) =>
      Iterator((i, it.size.toLong))).collect().toMap
    val nParts = rdd.getNumPartitions max 1
    val offsets = (0 until nParts).scanLeft(0L)(
      (acc, i) => acc + counts.getOrElse(i, 0L)).toArray
    val total = offsets(nParts)
    val specList = specs.toSeq.sortBy(_._1)
    val schema2 = StructType(df.schema.fields ++ specList.map { case (c, _) =>
      org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.LongType, nullable = false) })
    val out = rdd.mapPartitionsWithIndex { case (i, it) =>
      var k = offsets(i)
      it.map { r =>
        k += 1
        Row.fromSeq(r.toSeq ++ specList.map { case (c, (_, st)) =>
          hw(c) + st * k })
      }
    }
    val assigned = spark.createDataFrame(out, schema2)
      .select(tableSchema.fieldNames.toSeq.map(col): _*)
    (assigned, specs.map { case (c, (_, st)) => c -> (hw(c) + st * total) }, rdd)
  }

  /**
   * CONVERT an existing plain-parquet directory into a lake table (Delta's
   * `CONVERT TO DELTA` role — the migration path onto the engine): the
   * source files are ADOPTED BY HARD LINK into the table's data layout —
   * O(files) metadata operations, ZERO data movement or rewrite, so a
   * 100 TB parquet corpus converts in the time it takes to list it. The
   * source directory is left untouched (existing readers keep working; the
   * links share inodes, so no storage is duplicated — same trick the
   * optimizer uses to carry untouched files across compactions). Schema
   * comes from the parquet footers; `partitionBy` declares an existing
   * Hive `col=value` layout (the link step preserves the directory
   * structure, so partition pruning works immediately); `statsColumns`
   * runs the same one-pass zone-map collection a native write performs —
   * the only step that reads data, and the price of file skipping (omit it
   * for a pure-metadata convert; Delta's convert likewise scans for
   * stats). Commits as version 0 with op `convert`; change feeds and
   * streaming tails treat the adopted files as the initial insert batch.
   */
  def convertFrom(sourceDir: String, partitionBy: Option[String] = None,
      statsColumns: Seq[String] = Nil,
      bloomFilterColumns: Seq[String] = Nil): LakeTable = synchronized {
    require(!exists, s"LakeTable at $root already exists — CONVERT targets " +
      "a fresh root")
    val src = Paths.get(sourceDir).toAbsolutePath.normalize
    val files = listParquet(src)
    require(files.nonEmpty, s"no parquet files under $sourceDir")
    val inferred = StructType(spark.read.parquet(sourceDir).schema.map(
      _.copy(nullable = true)))
    partitionBy.foreach(p => require(inferred.fieldNames.contains(p),
      s"partition column $p not found — is $sourceDir Hive-partitioned by it?"))
    if (partitionBy.isEmpty) {
      // a Hive col=value layout silently yields NULLs for the partition
      // column if adopted unpartitioned — refuse instead
      val hive = files.flatMap(f => src.relativize(f).iterator().asScala
        .map(_.toString).find(s => s.contains("=") && !s.endsWith(".parquet")))
      require(hive.isEmpty,
        s"$sourceDir has col=value directories (${hive.head}) — pass partitionBy")
    }
    val dir = s"data/${UUID.randomUUID()}"
    files.foreach { f =>
      val dest = Paths.get(root, dir).resolve(src.relativize(f))
      Files.createDirectories(dest.getParent)
      try { Files.createLink(dest, f); () }
      catch { // cross-filesystem (EXDEV) or FS without links: copy instead
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          Files.copy(f, dest); ()
      }
    }
    val owned = partitionBy.map { p =>
      val vals = listPartitionValues(dir, p)
      if (vals.contains(null)) {
        deleteRecursively(Paths.get(root, dir))
        throw new IllegalArgumentException(
          s"null or __HIVE_DEFAULT_PARTITION__ value in partition column $p " +
            "— unaddressable by partition-scoped reads; convert aborted")
      }
      vals
    }
    val scols = statsColumns.filterNot(partitionBy.contains)
    val bcols = bloomFilterColumns.filterNot(partitionBy.contains)
    writeBloomIndex(dir, inferred, partitionBy, bcols)
    val committed = tryCommit(Manifest(inferred, partitionBy,
      Seq(DirEntry(dir, owned)), "convert", statsCols = scols,
      fileStats = collectFileStats(dir, inferred, partitionBy, scols),
      bloomCols = bcols), 0L)
    if (!committed) {
      deleteRecursively(Paths.get(root, dir))
      throw new ConcurrentWriteException(
        s"another writer created a table at $root during CONVERT")
    }
    this
  }

  /** GENERATED columns (Delta `GENERATED ALWAYS AS`): columns the table
   *  derives from an expression over the other columns — typically the
   *  partition column (`ship_month` from a timestamp), so writers never
   *  hand-maintain it and partition pruning stays trustworthy. A batch that
   *  OMITS a generated column gets it computed; a batch that SUPPLIES one is
   *  validated cell-for-cell against the expression (Delta's write-side
   *  contract) — a mismatch fails before anything is written. */
  def generatedColumns: Map[String, String] = manifest.generated.toMap

  /** Compute missing generated columns; validate supplied ones. */
  private def materializeGenerated(df: DataFrame, m: Manifest): DataFrame =
    m.generated.foldLeft(df) { case (d, (c, e)) =>
      val target = expr(e).cast(m.schema(c).dataType)
      if (!d.columns.contains(c)) d.withColumn(c, target)
      else {
        val bad = d.filter(!(col(c) <=> target)).limit(1).count()
        require(bad == 0,
          s"generated column $c: supplied values disagree with '$e'")
        d
      }
    }

  /** `colMap` is the table's column mapping: `df`, `pcol`, `statsCols` and
   *  `bloomCols` arrive in LOGICAL names; files, Hive dirs, stats keys and
   *  bloom sidecars are written PHYSICAL (see the translation-boundary
   *  notes above). */
  /** Data-file writes use INT64 TIMESTAMP(MICROS) instead of Spark's
   *  legacy INT96 default: INT96 is deprecated upstream and its footer
   *  statistics are unordered bytes, so zone maps for timestamp columns
   *  would need a read-back aggregation pass. Scoped set-and-restore —
   *  the session's own writes outside the lake keep their configured
   *  encoding. A concurrent restore race only re-encodes a file as INT96,
   *  whose absent footer stats never prune (safe degradation). */
  private def withMicrosTimestamps[A](f: => A): A = {
    val k = "spark.sql.parquet.outputTimestampType"
    // REFCOUNTED per session: concurrent lake writes (CONCURRENT pipeline
    // flows, parallel fixture builds) overlap — a naive save/restore pair
    // races, captures a sibling's override as "previous" and leaks
    // TIMESTAMP_MICROS into the session for good. First writer in saves,
    // last writer out restores.
    // Acquire/release run inside ConcurrentHashMap.compute so the entry
    // can be REMOVED when the last writer leaves — a session-churning app
    // no longer accumulates one entry per SparkSession it ever wrote
    // with. (A remove outside the map's per-key lock would race a fresh
    // computeIfAbsent into a second state object owning its own
    // save/restore.)
    LakeTable.microsOverride.compute(spark, (_, st0) => {
      val st = if (st0 == null) new LakeTable.MicrosState else st0
      if (st.depth == 0) {
        st.prev = spark.conf.getOption(k)
        spark.conf.set(k, "TIMESTAMP_MICROS")
      }
      st.depth += 1
      st
    })
    try f finally {
      LakeTable.microsOverride.compute(spark, (_, st) => {
        st.depth -= 1
        if (st.depth == 0) {
          st.prev match {
            case Some(v) => spark.conf.set(k, v)
            case None => spark.conf.unset(k)
          }
          null // drop the entry
        } else st
      })
      ()
    }
  }

  /** Driver-local parquet write of a SMALL in-memory relation: a frame
   *  whose optimized plan is a LocalRelation of simple-typed rows (event
   *  logs, tiny metadata batches, fixture seeds) is written by the driver
   *  thread straight through parquet-hadoop — ZERO Spark jobs, one file —
   *  instead of scheduling a distributed write for rows that already sit
   *  in driver memory (guide §5: the scheduler round-trip IS the cost for
   *  metadata-sized writes). Encodings match the distributed writer
   *  exactly: INT64 TIMESTAMP(MICROS) — InternalRow's own representation,
   *  the same encoding [[withMicrosTimestamps]] pins — DATE int32, STRING
   *  binary, snappy compression, footer stats recorded, so zone maps and
   *  the change feed read these files like any other. Any other plan
   *  shape, row count, or type falls back (returns false). */
  private def writeLocalRelation(df: DataFrame, dir: String): Boolean = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    def writable(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | DoubleType | FloatType | BooleanType |
           StringType | TimestampType | DateType => true
      case _ => false
    }
    df.queryExecution.optimizedPlan match {
      case lr: LocalRelation
          if lr.data.lengthCompare(LakeTable.LocalWriteMaxRows) <= 0 &&
            lr.output.forall(a => writable(a.dataType)) =>
        import org.apache.parquet.schema.{LogicalTypeAnnotation => L, Types}
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        import org.apache.parquet.schema.Type.Repetition
        val fields = lr.output
        val msgB = Types.buildMessage()
        fields.foreach { a =>
          val rep = if (a.nullable) Repetition.OPTIONAL else Repetition.REQUIRED
          val t = a.dataType match {
            case LongType => Types.primitive(INT64, rep)
            case IntegerType => Types.primitive(INT32, rep)
            case DoubleType => Types.primitive(DOUBLE, rep)
            case FloatType => Types.primitive(FLOAT, rep)
            case BooleanType => Types.primitive(BOOLEAN, rep)
            case StringType => Types.primitive(BINARY, rep).as(L.stringType())
            case TimestampType => Types.primitive(INT64, rep)
              .as(L.timestampType(true, L.TimeUnit.MICROS))
            case DateType => Types.primitive(INT32, rep).as(L.dateType())
            case other => sys.error(s"unreachable local-write type $other")
          }
          msgB.addField(t.named(a.name))
        }
        val msg = msgB.named("spark_schema")
        Files.createDirectories(Paths.get(root, dir))
        val f = new org.apache.hadoop.fs.Path(
          s"$root/$dir/part-00000-${UUID.randomUUID()}.snappy.parquet")
        val conf = spark.sessionState.newHadoopConf()
        val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
          .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(f, conf))
          .withConf(conf)
          .withType(msg)
          .withCompressionCodec(
            org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
          .build()
        try lr.data.foreach { r =>
          val g = new org.apache.parquet.example.data.simple.SimpleGroup(msg)
          var i = 0
          while (i < fields.length) {
            if (!r.isNullAt(i)) fields(i).dataType match {
              case LongType | TimestampType => g.add(i, r.getLong(i))
              case IntegerType | DateType => g.add(i, r.getInt(i))
              case DoubleType => g.add(i, r.getDouble(i))
              case FloatType => g.add(i, r.getFloat(i))
              case BooleanType => g.add(i, r.getBoolean(i))
              case StringType => g.add(i, r.getUTF8String(i).toString)
              case _ => ()
            }
            i += 1
          }
          w.write(g)
        } finally w.close()
        true
      case _ => false
    }
  }

  private def writeData(df0: DataFrame, pcol: Option[String],
      statsCols: Seq[String] = Nil,
      preclustered: Boolean = false,
      bloomCols: Seq[String] = Nil,
      colMap: Seq[(String, String)] = Nil): (String, Option[Seq[String]], Seq[FileStat]) = {
    def pn(c: String): String =
      colMap.collectFirst { case (l, p) if l == c => p }.getOrElse(c)
    val df = if (colMap.isEmpty) df0 else df0.withColumnsRenamed(colMap.toMap)
    val dir = s"data/${UUID.randomUUID()}"
    val owned = pcol.map(pn) match {
      case None =>
        if (!writeLocalRelation(df, dir))
          withMicrosTimestamps { df.write.parquet(s"$root/$dir") }
        None
      case Some(p) =>
        // Cluster by the partition column first: otherwise every task writes
        // a file per partition value it holds (tasks × partitions small
        // files). One shuffle → each partition's rows land in one task →
        // one file per partition. (A 100 TB deployment with giant single
        // partitions would add a within-partition salt to split files.)
        // `preclustered` callers (Z-order compaction) arranged their own
        // task layout — re-shuffling here would destroy it.
        val out = if (preclustered) df else df.repartition(col(p))
        withMicrosTimestamps { out.write.partitionBy(p).parquet(s"$root/$dir") }
        // Owned partition values from the written directory layout (p=value
        // subdirs) — a driver-side listing instead of a second full
        // evaluation of `df` (which may be an expensive join/window plan;
        // a pre-write validation scan would evaluate it twice). Null and
        // empty-string values both land in the Hive default-partition
        // sentinel dir and decode to null here; reject them BEFORE commit
        // and reclaim the uncommitted dir so no orphan lingers.
        val vals = listPartitionValues(dir, p)
        if (vals.contains(null)) {
          deleteRecursively(Paths.get(root, dir))
          throw new IllegalArgumentException(
            s"null or empty-string partition value in column $p " +
              "(both map to __HIVE_DEFAULT_PARTITION__, whose rows a " +
              "partition-scoped read could never locate); uncommitted data " +
              "dir removed")
        }
        Some(vals)
    }
    writeBloomIndex(dir, df.schema, pcol.map(pn), bloomCols.map(pn))
    (dir, owned, collectFileStats(dir, df.schema, pcol.map(pn), statsCols.map(pn)))
  }

  /** ONE-PASS data + change-image write for an unpartitioned CDF commit:
   *  the merged rows and the commit's change rows are two projections of
   *  the SAME join, so writing them as one `partitionBy` job over a side
   *  discriminator evaluates the join once — the union branches share
   *  their exchanges (ReuseExchange) — instead of persisting the join and
   *  running two sequential write jobs over it (guide §1.2: remove the
   *  pass, don't tune it). The side dirs are renamed into `data/` and
   *  `_changes/` (driver-side moves, no data I/O). Data files carry an
   *  all-NULL `_change_type` column (the union schema) that every reader
   *  ignores — reads are explicit-schema projections. A missing side dir
   *  means that side had zero rows: an empty dir serves the same empty
   *  relation an empty parquet write did. Returns
   *  (dataDir, fileStats, changesDir). */
  private def writeDataAndChanges(df0: DataFrame, changes0: DataFrame,
      statsCols: Seq[String], bloomCols: Seq[String],
      colMap: Seq[(String, String)]): (String, Seq[FileStat], String) = {
    def pn(c: String): String =
      colMap.collectFirst { case (l, p) if l == c => p }.getOrElse(c)
    val ren = colMap.toMap
    val df = if (colMap.isEmpty) df0 else df0.withColumnsRenamed(ren)
    val changes =
      if (colMap.isEmpty) changes0 else changes0.withColumnsRenamed(ren)
    val side = "__cdc_side"
    val unioned = df
      .withColumn(ChangeTypeCol, lit(null).cast("string"))
      .withColumn(side, lit("d"))
      .unionByName(changes.withColumn(side, lit("c")))
    val tmp = s"data/.mc-${UUID.randomUUID()}"
    withMicrosTimestamps {
      unioned.write.partitionBy(side).parquet(s"$root/$tmp") }
    val dir = s"data/${UUID.randomUUID()}"
    val ch = s"_changes/${UUID.randomUUID()}"
    def place(sideVal: String, dst: Path): Unit = {
      Files.createDirectories(dst.getParent)
      val src = Paths.get(root, tmp, s"$side=$sideVal")
      if (Files.isDirectory(src)) { Files.move(src, dst); () }
      else { Files.createDirectories(dst); () } // zero rows on this side
    }
    place("d", Paths.get(root, dir))
    place("c", Paths.get(root, ch))
    deleteRecursively(Paths.get(root, tmp))
    writeBloomIndex(dir, df.schema, None, bloomCols.map(pn))
    (dir, collectFileStats(dir, df.schema, None, statsCols.map(pn)), ch)
  }

  // ---- BLOOM-FILTER FILE INDEX (Delta bloom filter index analog) ----------
  //
  // Zone maps prune on VALUE RANGES, which needs the column clustered
  // (sorted appends, Z-order) — on a high-cardinality unclustered key every
  // file's [min, max] spans the domain and nothing prunes. The bloom index
  // answers the other question: "can this file contain THIS value?" — per
  // file, per indexed column, built in one distributed pass over the freshly
  // written dir and stored as a `_bloom/<dir-uuid>.idx` sidecar (never in
  // the manifest: index bytes are O(files × bits), manifests are read on
  // every snapshot resolution). Missing sidecars never prune, so hard-link
  // relinks (mutateWhere) and pre-index dirs stay correct, just unpruned.
  // At 100 TB: a point lookup on an indexed key reads ~fpp of the files a
  // zone-mapped-but-unclustered scan would read.

  /** Values hashed as their CAST-to-STRING rendering — the same canonical
   *  form zone-map bounds and [[ZonePred]] literals use, so probe and build
   *  agree for every column type. */
  private def writeBloomIndex(dir: String, schema: StructType,
      pcol: Option[String], bloomCols: Seq[String]): Unit = {
    val bcols = bloomCols.filter(c =>
      schema.fieldNames.contains(c) && !pcol.contains(c))
    if (bcols.isEmpty) return
    val raw = spark.read.schema(schema)
      .option("basePath", s"$root/$dir").parquet(s"$root/$dir")
      .select(input_file_name().as("__f") +:
        bcols.map(c => col(c).cast("string")): _*)
    val nb = bcols.size
    // per-partition partial blooms keyed by file, OR-merged EXECUTOR-SIDE
    // via reduceByKey: the driver receives exactly ONE merged bloom array
    // per file — the final index content it writes anyway — never the
    // partition-count × file-count partial set, and the merge work is
    // distributed. A 10k-file initial-load commit indexes without driver
    // memory pressure or a single-threaded merge loop.
    val partials = raw.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.Map.empty[
        String, Array[org.apache.spark.util.sketch.BloomFilter]]
      it.foreach { r =>
        val arr = m.getOrElseUpdate(r.getString(0),
          Array.fill(nb)(org.apache.spark.util.sketch.BloomFilter.create(
            BloomExpectedItems, BloomFpp)))
        var i = 0
        while (i < nb) {
          if (!r.isNullAt(i + 1)) arr(i).putString(r.getString(i + 1))
          i += 1
        }
      }
      m.iterator.map { case (f, arr) =>
        (f, arr.map { bf =>
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          bos.toByteArray
        })
      }
    }
    val merged = partials.reduceByKey(LakeTable.mergeBloomBytes _)
      .map { case (f, blooms) =>
        val idx = f.indexOf(dir)
        require(idx >= 0, s"file path $f not under $dir")
        f.substring(idx) -> blooms
      }.collect()
    val out = bloomIndexFile(dir)
    Files.createDirectories(out.getParent)
    val dos = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(out)))
    try {
      dos.writeInt(merged.size)
      merged.foreach { case (relPath, blooms) =>
        dos.writeUTF(relPath)
        dos.writeInt(bcols.size)
        bcols.zip(blooms).foreach { case (c, bytes) =>
          dos.writeUTF(c)
          dos.writeInt(bytes.length)
          dos.write(bytes)
        }
      }
    } finally dos.close()
  }

  /** `data/<uuid>` → `_bloom/<uuid>.idx` */
  private def bloomIndexFile(dir: String): Path =
    Paths.get(root, "_bloom", s"${Paths.get(dir).getFileName}.idx")

  /** file relPath → column → bloom; empty map when no sidecar exists. */
  private def readBloomIndex(dir: String)
      : Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]] =
    bloomIndexCache.getOrElseUpdate(dir, {
      val f = bloomIndexFile(dir)
      if (!Files.exists(f)) Map.empty
      else {
        val dis = new java.io.DataInputStream(new java.io.BufferedInputStream(
          Files.newInputStream(f)))
        try {
          (0 until dis.readInt()).map { _ =>
            val relPath = dis.readUTF()
            val cols = (0 until dis.readInt()).map { _ =>
              val c = dis.readUTF()
              val bytes = new Array[Byte](dis.readInt())
              dis.readFully(bytes)
              c -> org.apache.spark.util.sketch.BloomFilter.readFrom(
                new java.io.ByteArrayInputStream(bytes))
            }.toMap
            relPath -> cols
          }.toMap
        } finally dis.close()
      }
    })

  private val bloomIndexCache = scala.collection.concurrent.TrieMap
    .empty[String, Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]]]

  /** Partition values of a freshly written dir, decoded from its `p=value`
   *  subdirectory names (Hive layout). Spark percent-escapes special path
   *  characters on write; `%XX` sequences are decoded back. A null (or
   *  empty-string) partition value writes the Hive default-partition
   *  sentinel and maps to null.
   *
   *  Decoding matches Hive/Spark `unescapePathName`: consecutive `%XX`
   *  escapes accumulate into a byte run that is UTF-8-decoded ONCE (a
   *  multi-byte value such as `é` = `%C3%A9` must not become two mojibake
   *  chars — that would record a partition value no equality filter can
   *  ever match, silently hiding the partition), and a `%` not followed by
   *  two hex digits passes through literally.
   *
   *  Known Hive-layout ambiguity: a genuine string value equal to
   *  `"__HIVE_DEFAULT_PARTITION__"` is indistinguishable from null in the
   *  directory name, decodes to null here, and is rejected by [[writeData]]
   *  with the null/empty-string error. */
  private def listPartitionValues(dir: String, p: String): Seq[String] = {
    import LakeTable.unescapePathName
    val base = Paths.get(root, dir)
    val stream = Files.list(base)
    try stream.iterator().asScala
      .filter(f => Files.isDirectory(f) && f.getFileName.toString.startsWith(s"$p="))
      .map { f =>
        val v = unescapePathName(f.getFileName.toString.stripPrefix(s"$p="))
        if (v == "__HIVE_DEFAULT_PARTITION__") null else v
      }.toSeq
    finally stream.close()
  }

  /** Per-file zone maps for the freshly written `dir`: one aggregation pass
   *  over the NEW data only (grouped by `input_file_name`), min/max rendered
   *  through CAST-to-STRING so the manifest encoding is engine-portable.
   *  Driver-side result is one row per written file — bounded like the
   *  partition-value manifests. */
  private def collectFileStats(dir: String, schema: StructType,
      pcol: Option[String], statsCols: Seq[String]): Seq[FileStat] = {
    if (statsCols.isEmpty) Nil
    else {
      val files = listParquet(Paths.get(root, dir))
        .map(p => p -> Paths.get(root).relativize(p).toString)
      footerStats(files, schema, pcol, statsCols).getOrElse(statsOf(
        spark.read.schema(schema).option("basePath", s"$root/$dir").parquet(s"$root/$dir"),
        dir, schema, pcol, statsCols))
    }
  }

  /** Per-file zone maps read from the parquet FOOTERS of freshly written
   *  files — the write already computed exact per-chunk min/max, so the old
   *  read-back aggregation was a second full pass over every written
   *  file's stats columns (plus one Spark job per commit). Footer decoding
   *  is driver-side O(files) metadata I/O. Min/max render through Spark's
   *  own `Cast` to STRING, so the manifest encoding is identical to the
   *  aggregation pass's `min(col).cast("string")`. Ordering parity:
   *  parquet's signed comparators match Spark's for numerics, and its
   *  UNSIGNED lexicographic Binary order IS UTF8String's byte order for
   *  strings. Safety: a column whose footer lacks usable stats in some
   *  file is omitted for that file (absent stats never prune — same
   *  contract as the old NULL-aggregate omission); any unexpected shape
   *  returns None and the caller falls back to the aggregation pass. */
  private def footerStats(files: Seq[(Path, String)], schema: StructType,
      pcol: Option[String], statsCols: Seq[String]): Option[Seq[FileStat]] = {
    import org.apache.spark.sql.types._
    val scols = statsCols.filter(c => schema.fieldNames.contains(c) &&
      !pcol.contains(c))
    if (scols.isEmpty) return Some(Nil)
    val types = scols.map(c => c -> schema(c).dataType).toMap
    val conf = spark.sessionState.newHadoopConf()
    val zone = Some(spark.sessionState.conf.sessionLocalTimeZone)
    def render(v: Any, dt: DataType): String =
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Literal.create(v, dt),
        StringType, zone).eval() match {
        case null => null
        case s => s.toString
      }
    // parquet stat value (genericGetMin/Max) → Spark INTERNAL value of `dt`,
    // or None when the footer's shape isn't the one Spark writes for `dt`
    def decode(raw: Any, dt: DataType,
        chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[Any] = {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val logical = chunk.getPrimitiveType.getLogicalTypeAnnotation
      // foreign files (CONVERT) may carry unsigned int annotations whose
      // raw stats order differs from the signed Spark value — never trust
      def unsignedInt = logical match {
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => !i.isSigned
        case _ => false
      }
      (dt, raw) match {
        case _ if unsignedInt => None
        case (ByteType, i: java.lang.Integer) => Some(i.toByte)
        case (ShortType, i: java.lang.Integer) => Some(i.toShort)
        case (IntegerType, i: java.lang.Integer) => Some(i.toInt)
        case (LongType, l: java.lang.Long) => Some(l.toLong)
        case (FloatType, f: java.lang.Float) =>
          if (f.isNaN) None else Some(f.toFloat)
        case (DoubleType, d: java.lang.Double) =>
          if (d.isNaN) None else Some(d.toDouble)
        case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue())
        case (StringType, b: org.apache.parquet.io.api.Binary) =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromBytes(b.getBytes))
        case (DateType, i: java.lang.Integer) => Some(i.toInt)
        case (TimestampType | TimestampNTZType, l: java.lang.Long) =>
          logical match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MICROS => Some(l.toLong)
                case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                  Some(Math.multiplyExact(l.toLong, 1000L))
                case _ => None // NANOS never maps to TimestampType here
              }
            case _ => None
          }
        case (d: DecimalType, raw) =>
          val unscaled = raw match {
            case i: java.lang.Integer => Some(java.math.BigInteger.valueOf(i.toLong))
            case l: java.lang.Long => Some(java.math.BigInteger.valueOf(l))
            case b: org.apache.parquet.io.api.Binary =>
              Some(new java.math.BigInteger(b.getBytes))
            case _ => None
          }
          unscaled.map(u => Decimal(new java.math.BigDecimal(u, d.scale), d.precision, d.scale))
        case _ => None
      }
    }
    try {
      val out = files.flatMap { case (file, rel) =>
        val meta = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          conf, new org.apache.hadoop.fs.Path(file.toUri),
          org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER): @annotation.nowarn("cat=deprecation")
        val blocks = meta.getBlocks.asScala.toSeq
        // legacy-rebase files (CONVERT-adopted, written by old writers in
        // hybrid-Julian mode): Spark REBASES date/timestamp values on
        // read, so raw footer min/max can disagree with read-back values
        // for pre-Gregorian dates and would prune incorrectly — omit
        // those columns for the file (absent stats never prune)
        val legacyRebase = meta.getFileMetaData.getKeyValueMetaData
          .containsKey("org.apache.spark.legacyDateTime")
        // an empty file produced no row in the old groupBy(input_file_name)
        // pass either — no FileStat entry (absent stats never prune)
        if (blocks.forall(_.getRowCount == 0L)) None
        else {
          val mm = scols.flatMap { c =>
            val dt = types(c)
            if (legacyRebase && (dt == DateType || dt == TimestampType ||
                dt == TimestampNTZType)) None
            else {
            val chunks = blocks.map(_.getColumns.asScala
              .find(_.getPath.toDotString == c))
            if (chunks.exists(_.isEmpty)) None
            else {
              val sts = chunks.flatten.map(_.getStatistics)
              // a row group with NO recorded stats leaves the file
              // unbounded for this column; all-null groups (stats present,
              // no non-null value) contribute nothing to min/max
              if (sts.exists(st => st == null || st.isEmpty)) None
              else {
                val withVals = sts.filter(_.hasNonNullValue)
                if (withVals.isEmpty) None // all-null column ≡ old NULL agg
                else {
                  val merged = withVals.head.copy()
                    .asInstanceOf[org.apache.parquet.column.statistics.Statistics[_]]
                  withVals.tail.foreach(st => merged.mergeStatistics(
                    st.asInstanceOf[org.apache.parquet.column.statistics.Statistics[Nothing]]))
                  val chunk0 = chunks.head.get
                  for {
                    mn <- decode(merged.genericGetMin, dt, chunk0)
                    mx <- decode(merged.genericGetMax, dt, chunk0)
                    mnS <- Option(render(mn, dt))
                    mxS <- Option(render(mx, dt))
                  } yield c -> ((mnS, mxS))
                }
              }
            }
            }
          }.toMap
          Some(FileStat(rel, mm))
        }
      }
      Some(out)
    } catch { case scala.util.control.NonFatal(_) =>
      LakeTable.footerStatsFallbacks.incrementAndGet(); None
    }
  }

  /** Total row count of every parquet file under `dir`, from footers —
   *  driver-side metadata I/O, no Spark job. None on any read trouble. */
  private def parquetRowCount(dir: Path): Option[Long] =
    try {
      val conf = spark.sessionState.newHadoopConf()
      Some(listParquet(dir).map { f =>
        val meta = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          conf, new org.apache.hadoop.fs.Path(f.toUri),
          org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER): @annotation.nowarn("cat=deprecation")
        meta.getBlocks.asScala.map(_.getRowCount).sum
      }.sum)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The current manifest's per-file zone maps — test hook for footer-stats
   *  parity specs (root-relative path → col → (min, max) strings). */
  private[lake] def zoneStatsForTest: Map[String, Map[String, (String, String)]] =
    manifest.fileStats.map(fs => fs.path -> fs.minMax).toMap

  /** Zone maps for the files `df` scans (all expected under `dir`). */
  private def statsOf(df: DataFrame, dir: String, schema: StructType,
      pcol: Option[String], statsCols: Seq[String]): Seq[FileStat] = {
    val scols = statsCols.filter(c => schema.fieldNames.contains(c) &&
      !pcol.contains(c))
    if (scols.isEmpty) return Nil
    val aggs = scols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.map { r =>
        val full = r.getString(0)
        val idx = full.indexOf(dir)
        require(idx >= 0, s"file path $full not under $dir")
        val mm = scols.flatMap { c =>
          val mn = r.getAs[String](s"__mn_$c"); val mx = r.getAs[String](s"__mx_$c")
          if (mn == null || mx == null) None else Some(c -> ((mn, mx)))
        }.toMap
        FileStat(full.substring(idx), mm)
      }
  }

  /** Reconcile an incoming batch's schema against the table's (Delta write
   *  compatibility): same-name columns must keep their type (order and
   *  nullability are free); columns the batch omits read back as NULL from
   *  its files; NEW columns are rejected unless `mergeSchema` (Delta's
   *  `mergeSchema` option) — with it the table schema widens, the new
   *  columns nullable, and every pre-existing file serves NULL for them. */
  /** Validate an incoming batch's schema against the table's and produce
   *  the post-commit schema. Additive evolution needs `mergeSchema`; same-
   *  name columns must type-match EXCEPT under `widen` (the
   *  `delta.enableTypeWidening` property): a WIDENING change on an
   *  unblocked column either grows the table type metadata-only (wider
   *  incoming — old narrow files read through Spark's parquet widening
   *  promotion, proven in `TypeWideningSpec`) or is absorbed (narrower
   *  incoming — the batch is CAST UP at write, so its file and zone
   *  stats carry the column's real type). `wideBlocked`
   *  columns (partition / bloom-indexed / constraint- or
   *  generated-referenced / identity) always stay loud: their sidecars or
   *  expressions are keyed to the physical type. */
  private def reconcileSchema(table: StructType, incoming: StructType,
      mergeSchema: Boolean, widen: Boolean = false,
      wideBlocked: Set[String] = Set.empty): StructType = {
    val byName = table.fields.map(f => f.name -> f).toMap
    val widened = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.DataType]
    val novel = incoming.fields.flatMap { f =>
      byName.get(f.name) match {
        case Some(t) =>
          if (t.dataType != f.dataType) {
            val ok = widen && !wideBlocked.contains(f.name)
            if (ok && LakeTable.widensTo(t.dataType, f.dataType))
              widened(f.name) = f.dataType
            else require(ok && LakeTable.widensTo(f.dataType, t.dataType),
              s"column ${f.name}: incoming type ${f.dataType.simpleString} " +
                s"conflicts with table type ${t.dataType.simpleString} " +
                "(schema evolution is additive-only — full type changes need " +
                "overwrite; WIDENING changes need the " +
                s"${LakeTable.TypeWideningProp} property" +
                (if (widen) s", and ${f.name} is partition/bloom/constraint/" +
                  "generated/identity-bound, which pins its physical type"
                else "") + ")")
          }
          None
        case None =>
          require(mergeSchema,
            s"incoming batch adds column ${f.name} not in the table schema — " +
              "pass mergeSchema = true to evolve, or drop the column")
          Some(f.copy(nullable = true))
      }
    }
    StructType(table.fields.map(f =>
      widened.get(f.name).fold(f)(dt => f.copy(dataType = dt))) ++ novel)
  }

  /** Columns whose physical type is load-bearing beyond the data files —
   *  type widening refuses them: the partition column (Hive dir names),
   *  bloom-indexed columns (sidecar hashes are type-sensitive: an int
   *  hashed at write would false-negative a long probe — WRONG pruning),
   *  columns referenced by CHECK constraints or generated-column
   *  expressions (re-typed inputs could change expression semantics), and
   *  identity columns. An unparseable expression conservatively blocks
   *  every column. */
  private def wideningBlocked(m: Manifest): Set[String] = {
    def refs(e: String): Seq[String] = scala.util.Try {
      spark.sessionState.sqlParser.parseExpression(e).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.head
      }
    }.getOrElse(m.schema.fieldNames.toSeq)
    (m.pcol.toSeq ++ m.bloomCols ++ m.generated.map(_._1) ++
      m.generated.flatMap(g => refs(g._2)) ++
      m.constraints.flatMap(c => refs(c._2)) ++
      identitySpecsOf(m).keys).toSet
  }

  /** Whether `delta.enableTypeWidening` is on in `m`'s properties. */
  private def wideningOn(m: Manifest): Boolean =
    m.props.exists { case (k, v) =>
      k == LakeTable.TypeWideningProp && v.equalsIgnoreCase("true") }

  /** Append-only write — O(new data), never rewrites existing files.
   *  This is the bronze-sink primitive (reference keeps bronze append-only,
   *  `README.md:89`). On a partitioned table the new dir owns the batch's
   *  partition values alongside earlier owners (accumulation).
   *
   *  Schema: validated against the table via [[reconcileSchema]] — silent
   *  schema clobbering is an error; additive evolution is opt-in with
   *  `mergeSchema = true` (the Delta option). */
  def append(df0: DataFrame, mergeSchema: Boolean = false): Unit = synchronized {
    appendImpl(df0, mergeSchema, None); ()
  }

  /**
   * IDEMPOTENT append (Delta's `txnAppId`/`txnVersion` write options — the
   * retry-safety primitive): the batch commits ONLY if `txnVersion` is
   * strictly greater than the highest version this `appId` has already
   * committed, recorded in the manifest's transaction ledger. A retried job
   * (orchestrator re-run, speculative task, crashed-then-restarted writer)
   * replaying the same (appId, txnVersion) is a NO-OP — exactly-once
   * ingestion without an external ledger. Returns whether the batch landed.
   * The ledger rides the manifest, so it is snapshotted, restored, and
   * cloned with the table; the skip-check re-runs inside the commit race
   * loop, so two concurrent replays can never both land.
   */
  def appendIdempotent(appId: String, txnVersion: Long, df0: DataFrame,
      mergeSchema: Boolean = false): Boolean = synchronized {
    require(appId.nonEmpty, "appendIdempotent needs a non-empty appId")
    appendImpl(df0, mergeSchema, Some(appId -> txnVersion))
  }

  private case class TxnAlreadyApplied() extends RuntimeException

  /** Highest `txnVersion` the manifest's transaction ledger records for
   *  `appId` (Delta's `DeltaTable.txnVersion` probe — the read side of the
   *  idempotent-writer protocol). None before the app's first commit or on
   *  a non-existent table. */
  def lastTxnVersion(appId: String): Option[Long] =
    if (!exists) None
    else manifest.txns.collectFirst { case (a, tv) if a == appId => tv }

  /** Record `(appId, txnVersion)` in the transaction ledger WITHOUT data —
   *  a metadata-only commit (op `properties`, invisible to the change
   *  feed). The version-must-advance rule of [[appendIdempotent]] applies:
   *  a stale or replayed version is a no-op (returns false). Used by
   *  incremental flows whose data effect is itself idempotent (guarded
   *  merges) to advance their source-version ledger crash-safely: the
   *  ledger rides the manifest, so it snapshots, restores, and clones with
   *  the table — no side file to half-write. */
  def recordTxn(appId: String, txnVersion: Long): Boolean = synchronized {
    require(exists, s"recordTxn target $root does not exist")
    require(appId.nonEmpty, "recordTxn needs a non-empty appId")
    try {
      commitWithRetry { () =>
        val v = currentVersion
        val cur = readManifest(v)
        if (cur.txns.exists { case (a, tv) => a == appId && tv >= txnVersion })
          throw TxnAlreadyApplied()
        (cur.copy(op = "properties", cdfDir = None, commitTsMs = None,
          txns = cur.txns.filterNot(_._1 == appId) :+ (appId -> txnVersion)),
          v + 1)
      }
      true
    } catch { case TxnAlreadyApplied() => false }
  }

  /** Upsert `appId`'s transaction-ledger entry in a METADATA-ONLY commit —
   *  for flows whose content landed in a commit that could carry only ONE
   *  ledger entry (a multi-source MV bootstrap: the overwrite carries the
   *  first source's stamp, the rest land here). The ledger never regresses
   *  (same rule as txn-carrying writes); a crash before this stamp leaves
   *  that source's ledger absent, which re-bootstraps — one extra
   *  recompute, never a double-applied window. No-op (false) when the
   *  recorded high-water is already at/past `version`. */
  def stampTxn(appId: String, version: Long): Boolean = synchronized {
    require(exists, s"stampTxn target $root does not exist")
    try {
      commitWithRetry { () =>
        val v = currentVersion
        val cur = readManifest(v)
        if (cur.txns.exists { case (a, tv) => a == appId && tv >= version })
          throw TxnAlreadyApplied()
        (cur.copy(op = "properties", cdfDir = None, commitTsMs = None,
          txns = cur.txns.filterNot(_._1 == appId) :+ (appId -> version)),
          v + 1)
      }
      true
    } catch { case TxnAlreadyApplied() => false }
  }

  /** Remove `appId`'s transaction-ledger entry (metadata-only commit) —
   *  the full-refresh primitive: a flow whose target was rebuilt from
   *  scratch must re-bootstrap instead of resuming from a ledger that
   *  now describes wiped state. No-op (false) when the entry is absent. */
  def clearTxn(appId: String): Boolean = synchronized {
    require(exists, s"clearTxn target $root does not exist")
    try {
      commitWithRetry { () =>
        val v = currentVersion
        val cur = readManifest(v)
        if (!cur.txns.exists(_._1 == appId)) throw TxnAlreadyApplied()
        (cur.copy(op = "properties", cdfDir = None, commitTsMs = None,
          txns = cur.txns.filterNot(_._1 == appId)), v + 1)
      }
      true
    } catch { case TxnAlreadyApplied() => false }
  }

  /** Remove `appId`'s ledger entry AND every dot-suffixed descendant
   *  (`appId.…`) in ONE metadata commit — the multi-ledger [[clearTxn]]
   *  (an MV carries a family of ledgers: per-union-branch `.uN`, dim pins
   *  `.dimpin.*`, distinct companions `.dist.*` — a recompute overwrite
   *  must retire them all atomically or a later incremental life resumes
   *  from ledgers describing replaced state). The dot boundary keeps
   *  sibling ids that merely share a name prefix (`…mv.panel` vs
   *  `…mv.panel2`) untouched. No-op (false) when none match. */
  def clearTxnFamily(appId: String): Boolean = synchronized {
    require(exists, s"clearTxnFamily target $root does not exist")
    def inFamily(id: String): Boolean =
      id == appId || id.startsWith(appId + ".")
    try {
      commitWithRetry { () =>
        val v = currentVersion
        val cur = readManifest(v)
        if (!cur.txns.exists(t => inFamily(t._1))) throw TxnAlreadyApplied()
        (cur.copy(op = "properties", cdfDir = None, commitTsMs = None,
          txns = cur.txns.filterNot(t => inFamily(t._1))), v + 1)
      }
      true
    } catch { case TxnAlreadyApplied() => false }
  }

  private def appendImpl(df0: DataFrame, mergeSchema: Boolean,
      txn: Option[(String, Long)]): Boolean = {
    Files.createDirectories(Paths.get(root))
    val m0 = if (exists) Some(manifest) else None
    def applied(m: Manifest): Boolean = txn.exists { case (a, tv) =>
      m.txns.exists { case (a0, tv0) => a0 == a && tv0 >= tv } }
    // fast path: the transaction already landed — skip before the write
    if (m0.exists(applied)) return false
    val (pcol, scols) = m0.map(m => (m.pcol, m.statsCols)).getOrElse((None, Nil))
    val bcols = m0.map(_.bloomCols).getOrElse(Nil)
    // fail-fast validation BEFORE the (expensive) physical write; the commit
    // loop re-reconciles per attempt against the then-current snapshot
    var identBase = Map.empty[String, Long] // hw the assignment was based on
    var identNew = Map.empty[String, Long]  // hw after this batch
    var identPinned: Option[org.apache.spark.rdd.RDD[Row]] = None
    // the try opens BEFORE the validation block: a constraint/schema
    // rejection after assignIdentities pinned its RDD must still unpersist
    try {
    val df = m0.fold(df0) { m =>
      val d0 = materializeGenerated(df0, m)
      val specs = identitySpecsOf(m)
      val d = if (specs.isEmpty) d0 else {
        identBase = specs.keys.map(c => c -> identityHw(m, c)).toMap
        val (assigned, nhw, pinned) =
          assignIdentities(d0, m.schema, specs, identBase)
        identNew = nhw
        identPinned = Some(pinned)
        assigned
      }
      // wideningBlocked parses constraint/generated expressions — only
      // worth computing when the widening property is actually on (the
      // common append pays zero for the feature's existence)
      val widenOn = wideningOn(m)
      reconcileSchema(m.schema, d.schema, mergeSchema, widen = widenOn,
        wideBlocked = if (widenOn) wideningBlocked(m) else Set.empty)
      rejectTombstoned(m, d.schema)
      enforceConstraints(d, m.constraints)
      // a NARROWER batch under a widened column is CAST UP at write: the
      // file lands physically wide, so its zone stats are computed (and
      // rendered) under the column's real type — a float file's stats
      // under a double column would disagree with the promoted values a
      // read serves (see alterColumnType's stat-drop note)
      if (!widenOn) d
      else {
        val tgt = m.schema
        val needsUp = d.schema.fields.exists(f =>
          tgt.fieldNames.contains(f.name) &&
            LakeTable.widensTo(f.dataType, tgt(f.name).dataType) &&
            tgt(f.name).dataType != f.dataType)
        if (!needsUp) d
        else d.select(d.schema.fields.toSeq.map { f =>
          val up = tgt.fieldNames.contains(f.name) &&
            LakeTable.widensTo(f.dataType, tgt(f.name).dataType) &&
            tgt(f.name).dataType != f.dataType
          if (up) col(f.name).cast(tgt(f.name).dataType).as(f.name)
          else col(f.name)
        }: _*)
      }
    }
    pcol.foreach(p => require(df.columns.contains(p),
      s"append batch is missing the partition column $p"))
    val validatedConstraints = m0.map(_.constraints).getOrElse(Nil).toSet
    val (dir, owned, fstats) = writeData(df, pcol, scols, bloomCols = bcols,
      colMap = m0.map(_.colMap).getOrElse(Nil))
    def withTxn(ts: Seq[(String, Long)]): Seq[(String, Long)] = txn match {
      case None => ts
      case Some((a, tv)) => ts.filterNot(_._1 == a) :+ (a -> tv)
    }
    // a lost race re-reads the entry list and re-commits — the data dir is
    // already written, so append retries are manifest-only (no lost updates)
    try {
      commitWithRetry { () =>
        if (exists) {
          // snapshot the version ONCE and read THAT manifest: entry list and
          // CAS slot must come from the same version, or a racer committing
          // in between would make us publish a stale entry list one slot later
          val v = currentVersion
          val cur = readManifest(v)
          // a concurrent replay of the SAME transaction may have won the
          // race: re-check the ledger each attempt, never double-commit
          if (applied(cur)) throw TxnAlreadyApplied()
          // a concurrent addCheckConstraint may have landed after the
          // pre-write validation: re-enforce any constraint we did not
          // validate against, so the published table never carries data that
          // violates an active constraint (Delta's metadata-conflict rule)
          val unvalidated = cur.constraints.filterNot(validatedConstraints)
          if (unvalidated.nonEmpty) enforceConstraints(df, unvalidated)
          rejectTombstoned(cur, df.schema)
          // identity ids were minted against a specific high-water: if a
          // concurrent writer advanced it, committing would publish
          // duplicate ids — refuse (the caller retries the append, which
          // re-mints above the new high-water). Same-process appends are
          // serialized by `synchronized`, so this only fires cross-process.
          identBase.foreach { case (c, base) =>
            if (identityHw(cur, c) != base)
              throw new ConcurrentWriteException(
                s"identity column $c advanced concurrently — retry the append")
          }
          val props1 =
            if (identNew.isEmpty) cur.props
            else cur.props.filterNot { case (k, _) => identNew.keys.exists(c =>
                k == s"${LakeTable.IdentityPropPrefix}$c.hw") } ++
              identNew.toSeq.sortBy(_._1).map { case (c, n) =>
                s"${LakeTable.IdentityPropPrefix}$c.hw" -> n.toString }
          val mergedSchema = reconcileSchema(cur.schema, df.schema, mergeSchema,
            widen = wideningOn(cur),
            wideBlocked =
              if (wideningOn(cur)) wideningBlocked(cur) else Set.empty)
          // append-driven FLOAT→DOUBLE widening invalidates the column's
          // zone stats exactly like alterColumnType's explicit form: a
          // float's shortest decimal rendering ('0.1') disagrees with its
          // promoted double value, so float-era stats under the widened
          // type could WRONGLY prune. Drop them (absent stats never prune);
          // all other widenings are decimal-exact and keep theirs.
          val floatWidened = cur.schema.fields.iterator.filter { f =>
            f.dataType == org.apache.spark.sql.types.FloatType &&
              mergedSchema.fields.exists(n => n.name == f.name &&
                n.dataType == org.apache.spark.sql.types.DoubleType)
          }.map(f => physName(cur, f.name)).toSet
          val keptStats =
            if (floatWidened.isEmpty) cur.fileStats
            else cur.fileStats.map(fs => fs.copy(minMax = fs.minMax -- floatWidened))
          (Manifest(mergedSchema, pcol,
            cur.entries :+ DirEntry(dir, owned), "append",
            cur.cdfEnabled, statsCols = cur.statsCols,
            fileStats = keptStats ++ fstats,
            constraints = cur.constraints, generated = cur.generated,
            deleteVectors = cur.deleteVectors, bloomCols = cur.bloomCols,
            txns = withTxn(cur.txns), droppedCols = cur.droppedCols,
            colMap = cur.colMap, props = props1,
            clusterKey = cur.clusterKey), v + 1)
        } else
          (Manifest(df.schema, pcol, Seq(DirEntry(dir, owned)), "append",
            statsCols = scols, fileStats = fstats, txns = withTxn(Nil)), 0L)
      }
      maybeAutoCompact()
      true
    } catch {
      case TxnAlreadyApplied() =>
        // the orphaned dir was never referenced by any manifest: reclaim it
        deleteRecursively(Paths.get(root, dir))
        Files.deleteIfExists(bloomIndexFile(dir))
        false
      case e: ConcurrentWriteException =>
        // identity conflict (or exhausted races): the written dir carries
        // ids minted against a stale high-water — reclaim before rethrow
        deleteRecursively(Paths.get(root, dir))
        Files.deleteIfExists(bloomIndexFile(dir))
        throw e
    }
    } finally identPinned.foreach { r => r.unpersist(false); () }
  }

  /**
   * AUTO COMPACT (Delta `delta.autoOptimize.autoCompact`, property-driven):
   * after a successful append on a table with TBLPROPERTIES
   * `autoCompact = 'true'`, bin-pack the accumulated small files once their
   * count reaches `autoCompact.minFiles` (default 8; Delta's minNumFiles
   * rule). Streaming ingest is the motivating shape: thousands of tiny
   * trigger-interval appends degrade every later scan; auto-compact keeps
   * the small-file population bounded WITHOUT an external maintenance job.
   * Cost stays O(small files) per invocation ([[optimizeCompact]] hard-links
   * everything already large). BEST-EFFORT like Delta's: a lost commit race
   * or any failure is swallowed — the append itself has already committed,
   * and the next append retries the compaction.
   */
  private def maybeAutoCompact(): Unit = {
    val m = try manifest catch { case scala.util.control.NonFatal(_) => return }
    if (!m.props.exists { case (k, v) =>
        k == LakeTable.AutoCompactProp && v.trim.equalsIgnoreCase("true") })
      return
    val minFiles = m.props.collectFirst {
      case (LakeTable.AutoCompactMinFilesProp, v) => v.trim.toInt
    }.getOrElse(8)
    val target = m.props.collectFirst {
      case (LakeTable.AutoCompactTargetBytesProp, v) => v.trim.toLong
    }.getOrElse(128L * 1024 * 1024)
    val small = m.entries.flatMap(e => listParquet(Paths.get(root, e.dir)))
      .count(p => Files.size(p) < target / 2)
    if (small < minFiles) return
    try { optimizeCompact(target); () }
    catch { case scala.util.control.NonFatal(_) => () } // best-effort
  }

  /** Full-snapshot replace (new version; old files kept until vacuum).
   *  `txn` rides the commit atomically (Delta's txnAppId/txnVersion on
   *  overwrite) — a replayed (appId, txnVersion) still overwrites (the
   *  effect is naturally idempotent) but the ledger never regresses. */
  def overwrite(df: DataFrame, partitionBy: Option[String] = None,
      txn: Option[(String, Long)] = None): Unit =
    replaceAll(df, partitionBy, "overwrite", expected = None, txn = txn)

  /** `expected = Some(v)`: conditional replace — the snapshot this data was
   *  computed from must still be current, else [[ConcurrentWriteException]]
   *  (merge/compact). `None`: last-writer-wins replace, retried on races. */
  /** `(appId → tv)` upserted into a transaction ledger (one entry per app);
   *  the ledger never regresses — a replayed older version keeps the
   *  recorded high-water. */
  private def withTxnLedger(ts: Seq[(String, Long)],
      txn: Option[(String, Long)]): Seq[(String, Long)] = txn match {
    case None => ts
    case Some((a, tv)) =>
      if (ts.exists { case (a0, tv0) => a0 == a && tv0 >= tv }) ts
      else ts.filterNot(_._1 == a) :+ (a -> tv)
  }

  private def txnAppliedIn(m: Manifest, txn: Option[(String, Long)]): Boolean =
    txn.exists { case (a, tv) =>
      m.txns.exists { case (a0, tv0) => a0 == a && tv0 >= tv } }

  /** Run `body` on its own thread so its Spark job(s) OVERLAP the caller's
   *  next job instead of serializing behind it (guide §2.6: a commit's
   *  independent writes — change images, deletion vectors, data files — are
   *  independent jobs; only your driver code makes them sequential). The
   *  returned thunk joins and rethrows the body's failure. */
  private def inParallel[A](body: => A): () => A = {
    val fut = new java.util.concurrent.FutureTask[A](() => body)
    val th = new Thread(fut, "lake-parallel-write")
    th.setDaemon(true)
    th.start()
    () => try fut.get() catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }

  private def replaceAll(df: DataFrame, partitionBy: Option[String],
      op: String, expected: Option[Long], cdfDir: () => Option[String] = () => None,
      preclustered: Boolean = false,
      txn: Option[(String, Long)] = None,
      // non-empty = this rewrite CLUSTERED the table on these columns:
      // flag the output entry and record the key for incremental OPTIMIZE
      clusteredAs: Seq[String] = Nil,
      // the commit's change images, written in the SAME Spark job as the
      // data (one-pass union write; unpartitioned targets only) — takes
      // precedence over `cdfDir`
      changes: Option[DataFrame] = None): Unit = synchronized {
    Files.createDirectories(Paths.get(root))
    val cur = if (exists) Some(manifest) else None
    val pcol = partitionBy.orElse(cur.flatMap(_.pcol))
    val scols = cur.map(_.statsCols).getOrElse(Nil)
    // overwrite materializes generated columns and enforces CHECK constraints
    // on the incoming snapshot; compact/merge/zorder rewrite rows that were
    // already validated on their way in
    val df1 =
      if (op == "overwrite")
        cur.fold(df) { c =>
          val d = materializeGenerated(df, c)
          enforceConstraints(d, c.constraints)
          d
        }
      else df
    val keptMap = cur.map(_.colMap.filter { case (l, _) =>
      df1.columns.contains(l) }).getOrElse(Nil)
    require(changes.isEmpty || pcol.isEmpty,
      "one-pass change-image writes are for unpartitioned targets")
    val (dir, owned, fstats, unionCh) = changes match {
      case Some(ch) =>
        val (d, fs, c) = writeDataAndChanges(df1, ch, scols,
          bloomCols = cur.map(_.bloomCols).getOrElse(Nil), colMap = keptMap)
        (d, None, fs, Some(c))
      case None =>
        val (d, o, fs) = writeData(df1, pcol, scols, preclustered,
          bloomCols = cur.map(_.bloomCols).getOrElse(Nil), colMap = keptMap)
        (d, o, fs, None)
    }
    // resolve AFTER writeData: a caller's in-flight change-image write
    // (launched via inParallel) overlaps the data write above
    val cdfDirV = unionCh.orElse(cdfDir())
    val validatedConstraints = cur.map(_.constraints).getOrElse(Nil).toSet
    val m = Manifest(df1.schema, pcol,
      Seq(DirEntry(dir, owned, clustered = clusteredAs.nonEmpty)), op,
      cur.exists(_.cdfEnabled), cdfDirV, statsCols = scols, fileStats = fstats,
      txns = withTxnLedger(cur.map(_.txns).getOrElse(Nil), txn),
      constraints = cur.map(_.constraints).getOrElse(Nil),
      generated = cur.map(_.generated).getOrElse(Nil),
      bloomCols = cur.map(_.bloomCols).getOrElse(Nil),
      colMap = keptMap, props = cur.map(_.props).getOrElse(Nil),
      clusterKey =
        if (clusteredAs.nonEmpty) clusteredAs
        else cur.map(_.clusterKey).getOrElse(Nil))
    expected match {
      case Some(v) =>
        if (!tryCommit(m, v + 1))
          throw new ConcurrentWriteException(
            s"$op computed against version $v of $root, but a concurrent " +
              s"writer committed v${v + 1} first — recompute and retry")
      case None =>
        commitWithRetry { () =>
          if (exists) {
            // re-derive table metadata from the THEN-CURRENT manifest: a
            // constraint or generated column added after our pre-write
            // snapshot must survive this overwrite (not be clobbered by the
            // stale copy) and be enforced on the data we are publishing
            val v = currentVersion
            val c = readManifest(v)
            val unvalidated = c.constraints.filterNot(validatedConstraints)
            if (op == "overwrite" && unvalidated.nonEmpty)
              enforceConstraints(df1, unvalidated)
            // carry the THEN-CURRENT ledger: an idempotent append committed
            // after our pre-write snapshot must not lose its txn entry
            (m.copy(cdfEnabled = c.cdfEnabled, constraints = c.constraints,
              generated = c.generated, bloomCols = c.bloomCols,
              txns = withTxnLedger(c.txns, txn), props = c.props), v + 1)
          } else (m, 0L)
        }
    }
  }

  /**
   * Join-based MERGE with Delta `MERGE INTO` semantics
   * (`DIM_Gold_layer.py:276-283`):
   *   - matched && guard       → source row  (whenMatchedUpdateAll(condition))
   *   - matched && !guard      → keep target row
   *   - source-only            → insert source row (whenNotMatchedInsertAll)
   *   - target-only            → keep target row
   *
   * `matchedGuard` is a SQL expression over aliases `s` (source) and `t`
   * (target), e.g. `"s.modifiedDate >= t.modifiedDate"`.
   *
   * Requires the source to have at most one row per key (callers dedup
   * first — see Pipeline.autoCdcFlow); enforced cheaply only when
   * `checkUniqueKeys` is set.
   *
   * On a PARTITIONED table the merge is partition-scoped: only the
   * partitions present in the source are read (pruned scan), merged, and
   * rewritten — O(touched partitions), not O(table). Rows may not change
   * their partition value through a matched update (enforced by the join
   * semantics only when the partition column is part of `keys`; callers
   * partitioning by a stable column satisfy this by construction).
   *
   * Plan shape: one shuffle on the merge keys (full-outer hash/sort-merge
   * join; AQE broadcasts a small source side as a broadcast outer join where
   * legal) followed by a projection — no driver-side iteration.
   */
  def merge(
      src0: DataFrame,
      keys: Seq[String],
      matchedGuard: Option[String] = None,
      checkUniqueKeys: Boolean = false,
      mergeSchema: Boolean = false,
      matchedSet: Option[Map[String, String]] = None,
      matchedDelete: Boolean = false,
      matchedDeleteWhen: Option[String] = None,
      deleteUnmatchedTarget: Option[String] = None,
      insertAll: Boolean = true,
      insertGuard: Option[String] = None,
      insertSet: Option[Map[String, String]] = None,
      txn: Option[(String, Long)] = None,
      nullSafeKeys: Boolean = false): Unit = synchronized {
    require(exists, s"merge target $root does not exist — create() or append() first")
    require(!(matchedDelete && matchedSet.nonEmpty),
      "WHEN MATCHED can DELETE or UPDATE, not both")
    require(!(matchedDelete && matchedDeleteWhen.nonEmpty),
      "matchedDelete (sole clause) and matchedDeleteWhen (second clause) are exclusive")
    val v0 = currentVersion
    val m = readManifest(v0) // merge computes against THIS snapshot
    // idempotent merge (Delta's txnAppId/txnVersion on MERGE): the ledger
    // entry commits ATOMICALLY with the merged data, so a replayed
    // (appId, txnVersion) — crash-retry, orchestrator re-run — is a no-op.
    // This is the primitive that makes NON-idempotent merge effects (e.g.
    // the signed-delta aggregate MV) exactly-once.
    if (txnAppliedIn(m, txn)) return
    val src = materializeGenerated(src0, m)
    // WITH SCHEMA EVOLUTION (Delta's MERGE form): the source may carry
    // ADDITIVE new columns — the table schema widens (nullable), matched
    // target pre-images serve NULL for them. Source must still supply every
    // existing target column; type changes are rejected (same contract as
    // append's mergeSchema).
    val schema1 =
      if (mergeSchema) {
        rejectTombstoned(m, src.schema)
        reconcileSchema(m.schema, src.schema, mergeSchema = true)
      } else m.schema
    val cols = schema1.fieldNames.toSeq
    // full-ROW clauses (UPDATE SET *, INSERT *) reference every target
    // column on the source side; column-LEVEL clauses only reference what
    // their expressions name, so an op-coded CDC batch may carry EXTRA
    // columns (`op`, sequence metadata) and omit nothing but the keys —
    // Delta's contract. Full-row requirement holds iff such a clause exists.
    val fullFromUpdate = matchedSet.isEmpty && !matchedDelete
    val fullFromInsert = insertAll && insertSet.isEmpty
    if (fullFromUpdate || fullFromInsert)
      require(cols.forall(src.columns.contains),
        s"merge source schema ${src.columns.mkString(",")} is missing target " +
          s"columns (full-row SET */INSERT * needs them all): ${cols.mkString(",")}" +
          (if (mergeSchema) "" else " (additive columns need mergeSchema = true)"))
    require(keys.forall(src.columns.contains),
      s"merge source is missing key column(s) ${keys.mkString(",")}")
    require(mergeSchema || src.columns.forall(c => cols.contains(c) ||
        !(fullFromUpdate || fullFromInsert)),
      s"merge source adds column(s) ${src.columns.filterNot(cols.contains).mkString(",")} " +
        "not in the table schema — pass mergeSchema for evolution")
    // constraints gate the rows that can LAND: the full source row on
    // full-row paths; the merged output re-gates column-level paths below
    if (fullFromUpdate || fullFromInsert) enforceConstraints(
      src.select(cols.map(col): _*), m.constraints)
    matchedSet.foreach { as =>
      require(as.nonEmpty, "UPDATE SET with no assignments")
      def refs(e: String, c: String): Boolean =
        spark.sessionState.sqlParser.parseExpression(e).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.nameParts.last.equalsIgnoreCase(c) => a
        }.nonEmpty
      as.keys.foreach { c =>
        require(cols.contains(c), s"unknown SET column $c")
        require(!keys.contains(c), s"cannot assign merge key $c")
        require(!m.pcol.contains(c),
          s"cannot assign partition column $c (a row may not change partition)")
        require(!m.generated.exists(_._1 == c),
          s"$c is a generated column — it is recomputed, not assigned")
        m.generated.foreach { case (g, e) => require(!refs(e, c),
          s"generated column $g derives from $c — assigning it would " +
            "stale the derived value; rewrite via overwrite instead") }
      }
    }
    insertSet.foreach { as =>
      require(insertAll, "insertSet without an insert clause")
      require(as.nonEmpty, "INSERT with no columns")
      as.keys.foreach(c => require(cols.contains(c), s"unknown INSERT column $c"))
      as.keys.foreach(c => require(!m.generated.exists(_._1 == c),
        s"$c is a generated column — it is computed, not inserted"))
      // partition-scoped merges derive touched partitions from the SOURCE's
      // partition values; a column-level INSERT could fabricate values
      // outside that set and double-own a partition — refuse on partitioned
      // targets (INSERT * carries the source's own partition value)
      require(m.pcol.isEmpty,
        "column-level INSERT is not supported on partitioned targets — use INSERT *")
    }
    if (checkUniqueKeys) {
      val dups = src.groupBy(keys.map(col): _*).count().filter(col("count") > 1).limit(1).count()
      require(dups == 0, s"merge source has duplicate keys $keys")
    }

    val guard = matchedGuard.map(expr).getOrElse(lit(true))
    // A source-side column reference that tolerates a KEYS-ONLY source: when
    // no full-row clause is active (e.g. WHEN MATCHED THEN DELETE only — a
    // Delta-legal shape), the projection's insert/update branches are dead
    // (`lit(false)` predicates) but would still fail ANALYSIS on `s.<col>`
    // references to columns the source never carried. Substitute a typed
    // NULL for absent columns — live full-row branches can never see it
    // because the presence `require` above already demanded every column.
    def srcCol(c: String): Column =
      if (src.columns.contains(c)) col(s"s.$c")
      else lit(null).cast(schema1(c).dataType)
    def joinedOf(target: DataFrame): DataFrame = {
      val t = target.withColumn(T_MARK, lit(true)).alias("t")
      val s = src.withColumn(S_MARK, lit(true)).alias("s")
      // SQL MERGE equality never matches NULL keys (Delta parity — the
      // default); GROUP-BY-derived keys (the aggregate-MV maintainers)
      // opt into null-safe matching so a NULL group stays ONE group
      val joinCond = keys.map(k =>
        if (nullSafeKeys) col(s"t.$k") <=> col(s"s.$k")
        else col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
      t.join(s, joinCond, "full_outer")
    }
    // unified matched-row predicates (shared by the projection and the CDF):
    //  - matchedDelete: DELETE is the SOLE matched clause, guarded by `guard`
    //  - matchedDeleteWhen: DELETE rides NEXT TO an update clause — its own
    //    condition wins first (the SQL walk pre-composes statement order
    //    into these two predicates), updates apply to the remainder
    val isMatched = col(S_MARK).isNotNull && col(T_MARK).isNotNull
    val matchedDelPred: org.apache.spark.sql.Column =
      if (matchedDelete) isMatched && guard
      else matchedDeleteWhen match {
        case Some(c) => isMatched && coalesce(expr(c), lit(false))
        case None => lit(false)
      }
    val matchedUpdPred: org.apache.spark.sql.Column =
      if (matchedDelete) lit(false)
      else isMatched && !matchedDelPred && guard

    def mergedFrom(joined0: DataFrame): DataFrame = {
      // row classes shared by every clause combination; DELETE clauses and
      // a missing INSERT * clause DROP whole classes before the projection
      val isTargetOnly = col(T_MARK).isNotNull && col(S_MARK).isNull
      val dropMatched = matchedDelPred
      val dropTargetOnly = deleteUnmatchedTarget match {
        // WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE: cond over t.*
        case Some(c) => isTargetOnly && coalesce(expr(c), lit(false))
        case None => lit(false)
      }
      val isInsertRow = col(S_MARK).isNotNull && col(T_MARK).isNull
      val dropInsert =
        if (!insertAll) isInsertRow
        else insertGuard match {
          // WHEN NOT MATCHED [AND c]: source-only rows failing c are ignored
          case Some(c) => isInsertRow && !coalesce(expr(c), lit(false))
          case None => lit(false)
        }
      val joined = joined0.filter(!coalesce(
        dropMatched || dropTargetOnly || dropInsert, lit(false)))
      // the inserted image: the source row (INSERT *), or — column-level
      // INSERT (cols) VALUES (...) — the assigned expressions with NULL for
      // omitted columns (Delta's rule)
      def insertedCol(c: String): Column = insertSet match {
        case None => srcCol(c)
        case Some(as) => as.get(c).map(expr).getOrElse(
          lit(null).cast(schema1(c).dataType))
      }
      val isIns = col(S_MARK).isNotNull && col(T_MARK).isNull
      matchedSet match {
        case None => // UPDATE SET *: update-class rows take the source row
          joined.select(cols.map(c =>
            when(isIns, insertedCol(c))
              .otherwise(when(matchedUpdPred, srcCol(c)).otherwise(col(s"t.$c")))
              .as(c)): _*)
        case Some(assigns) =>
          // COLUMN-LEVEL UPDATE SET c = <expr over s/t>: update-class rows
          // keep the TARGET row with only the assigned columns computed
          joined.select(cols.map { c =>
            val updated = assigns.get(c).map(expr).getOrElse(col(s"t.$c"))
            when(matchedUpdPred, updated)
              .otherwise(when(isIns, insertedCol(c)).otherwise(col(s"t.$c")))
              .as(c)
          }: _*)
      }
    }
    // O8 change rows out of the SAME join: a source-only row is an insert;
    // a matched-and-guard-passing row emits its target pre-image and source
    // post-image (Delta CDF's row set for a MERGE without delete clauses).
    def changesFrom(joined: DataFrame): DataFrame = {
      val isInsert = lit(insertAll) && col(S_MARK).isNotNull && col(T_MARK).isNull &&
        insertGuard.map(c => coalesce(expr(c), lit(false))).getOrElse(lit(true))
      val isUpdate = matchedUpdPred
      val isMatchDel = matchedDelPred
      val isSyncDel = deleteUnmatchedTarget match {
        case Some(c) => col(T_MARK).isNotNull && col(S_MARK).isNull &&
          coalesce(expr(c), lit(false))
        case None => lit(false)
      }
      def row(side: String, kind: String) = struct(
        (cols.map(c => (if (side == "s") srcCol(c) else col(s"$side.$c")).as(c)) :+
          lit(kind).as(ChangeTypeCol)): _*)
      // with column-level assignments the POSTIMAGE is the assigned target
      // row, not the raw source row
      def postRow = matchedSet match {
        case None => row("s", "update_postimage")
        case Some(assigns) => struct(
          (cols.map(c => assigns.get(c).map(expr).getOrElse(col(s"t.$c")).as(c)) :+
            lit("update_postimage").as(ChangeTypeCol)): _*)
      }
      def insRow = insertSet match {
        case None => row("s", "insert")
        case Some(as) => struct(
          (cols.map(c => as.get(c).map(expr)
            .getOrElse(lit(null).cast(schema1(c).dataType)).as(c)) :+
            lit("insert").as(ChangeTypeCol)): _*)
      }
      joined.select(explode(array(
          when(isInsert, insRow),
          when(isUpdate, row("t", "update_preimage")),
          when(isUpdate, postRow),
          when(isMatchDel || isSyncDel, row("t", "delete")))).as("__ch"))
        .filter(col("__ch").isNotNull)
        .select((cols :+ ChangeTypeCol).map(c => col(s"__ch.$c").as(c)): _*)
    }
    /** Materialize the commit's change rows under `_changes/` (referenced by
     *  the manifest; orphaned by a lost race → cleaned by vacuum). */
    def writeChanges(changes: DataFrame): Option[String] = {
      if (!m.cdfEnabled) None
      else {
        val d = s"_changes/${UUID.randomUUID()}"
        toPhysicalNames(m, changes).write.parquet(s"$root/$d")
        Some(d)
      }
    }

    // fast path: merging into a table with no data dirs inserts everything —
    // skip the full-outer join against an empty side (bootstrap merges are
    // common: every CDC flow's first batch lands here)
    if (m.entries.isEmpty) {
      if (!insertAll) return // nothing to delete, nothing to insert: no-op
      // bootstrap inserts honor the insert guard and column-level INSERT
      // exactly like the joined path (source rows are all source-only here)
      val sAliased = src.alias("s")
      val guarded = insertGuard match {
        case Some(c) => sAliased.filter(coalesce(expr(c), lit(false)))
        case None => sAliased
      }
      val flat = insertSet match {
        case None => guarded.select(cols.map(col): _*)
        case Some(as) => guarded.select(cols.map(c =>
          as.get(c).map(expr).getOrElse(lit(null).cast(schema1(c).dataType))
            .as(c)): _*)
      }
      if (insertSet.nonEmpty) enforceConstraints(flat, m.constraints)
      // all-insert commit: the data dir IS the change set — record the
      // from-data marker instead of writing every row a second time
      val chDir = if (m.cdfEnabled) Some(LakeTable.CdfFromData) else None
      replaceAll(flat, m.pcol, "merge", Some(v0), () => chDir, txn = txn)
      maybeAutoCompact()
      return
    }

    // under evolution the target snapshot serves NULL for the new columns
    def widen(target: DataFrame): DataFrame =
      schema1.fields.foldLeft(target)((d, f) =>
        if (d.columns.contains(f.name)) d
        else d.withColumn(f.name, lit(null).cast(f.dataType)))

    // FILE-PRUNED unpartitioned merge (Delta's merge file pruning): when
    // the table is large enough that a full rewrite dwarfs one small
    // bounds aggregation, join only the files whose zone maps admit a
    // source key — every other file is re-referenced by hard link, making
    // a keyed merge O(files that may contain matches + new data) instead
    // of O(table). Pruning is SOUND: a skipped file's key range provably
    // misses every source key, so it can hold no matched row and no row
    // that would flip an insert classification. Applies only when the
    // sync clause (which must see every target row), deletion vectors
    // (whose coordinates are path-keyed) and schema evolution are absent.
    if (m.pcol.isEmpty && deleteUnmatchedTarget.isEmpty &&
        m.deleteVectors.isEmpty && !mergeSchema) {
      mergePrunePlan(m, src, keys, nullSafeKeys).foreach { plan =>
        val touched = plan.flatMap(_._2)
        val candidates =
          if (touched.isEmpty) readScoped(m, None).limit(0)
          else toLogicalNames(m, spark.read.schema(physSchema(m))
            .parquet(touched.map(f => s"$root/$f"): _*))
        val joined = joinedOf(candidates)
        val merged = mergedFrom(joined)
        if (matchedSet.nonEmpty || insertSet.nonEmpty)
          enforceConstraints(merged, m.constraints)
        val (dir, fstats, chDir) =
          if (m.cdfEnabled) {
            val (d, fs, c) = writeDataAndChanges(merged, changesFrom(joined),
              m.statsCols, m.bloomCols, m.colMap)
            (d, fs, Some(c))
          } else {
            val (d, _, fs) = writeData(merged, None, m.statsCols,
              bloomCols = m.bloomCols, colMap = m.colMap)
            (d, fs, None)
          }
        val newEntries = scala.collection.mutable.ArrayBuffer.empty[DirEntry]
        val newStats = scala.collection.mutable.ArrayBuffer.empty[FileStat]
        plan.foreach { case (e, touchedInDir, _) =>
          if (touchedInDir.isEmpty) {
            // no file in this dir can match: re-reference as-is (stats,
            // bloom sidecar and clustered flag all stay valid)
            newEntries += e
            newStats ++= m.fileStats.filter(_.path.startsWith(e.dir + "/"))
          } else {
            // hard-link the untouched files into a fresh dir (zero data
            // I/O), dropping the rewritten ones — the mutateWhere pattern
            val newDir = s"data/${UUID.randomUUID()}"
            Files.createDirectories(Paths.get(root, newDir))
            val touchedSet = touchedInDir.toSet
            val all = listParquet(Paths.get(root, e.dir))
              .map(p => Paths.get(root).relativize(p).toString)
            all.filterNot(touchedSet).foreach { f =>
              val rel = Paths.get(e.dir).relativize(Paths.get(f))
              val dst = Paths.get(root, newDir).resolve(rel)
              Files.createDirectories(dst.getParent)
              Files.createLink(dst, Paths.get(root, f))
              m.fileStats.find(_.path == f).foreach { fs =>
                newStats += fs.copy(path = s"$newDir/$rel")
              }
            }
            newEntries += DirEntry(newDir, e.owned, clustered = e.clustered)
          }
        }
        if (!tryCommit(Manifest(schema1, m.pcol,
            newEntries.toSeq :+ DirEntry(dir, None), "merge",
            m.cdfEnabled, chDir, statsCols = m.statsCols,
            fileStats = newStats.toSeq ++ fstats,
            txns = withTxnLedger(m.txns, txn), droppedCols = m.droppedCols,
            constraints = m.constraints, generated = m.generated,
            bloomCols = m.bloomCols, colMap = m.colMap, props = m.props,
            clusterKey = m.clusterKey), v0 + 1))
          throw new ConcurrentWriteException(
            s"merge computed against version $v0 of $root, but a concurrent " +
              s"writer committed v${v0 + 1} first — recompute and retry")
        maybeAutoCompact()
        return
      }
    }

    // WHEN NOT MATCHED BY SOURCE DELETE must examine target-only rows in
    // EVERY partition (sync semantics touch the whole table by definition),
    // so it takes the full-rewrite path even on partitioned targets —
    // replaceAll keeps the partitioning. A keys-only source (delete-only
    // merge) that doesn't carry the partition column can't scope the touched
    // partitions either — same full-rewrite fallback, partitioning kept.
    m.pcol.filter(p => deleteUnmatchedTarget.isEmpty && src.columns.contains(p)) match {
      case None if m.cdfEnabled && m.pcol.isEmpty =>
        // ONE-PASS commit: merged rows and change images are two projections
        // of the same join — write both in a single job (union + side
        // partition) instead of persisting the join and running two
        // sequential jobs over it. The union branches reuse the join's
        // exchanges, so the (often expensive) merge-source subtree
        // evaluates once.
        val joined = joinedOf(widen(readScoped(m, None)))
        val merged = mergedFrom(joined)
        // SET * writes source rows (validated above); column-level
        // clauses synthesize new rows — gate them before anything lands
        if (matchedSet.nonEmpty || insertSet.nonEmpty)
          enforceConstraints(merged, m.constraints)
        replaceAll(merged, m.pcol, "merge", Some(v0), txn = txn,
          changes = Some(changesFrom(joined)))
        maybeAutoCompact()
      case None =>
        val joined = joinedOf(widen(readScoped(m, None)))
        val pinned = // two consumers under CDF: pin the join, not twice the work
          if (m.cdfEnabled) joined.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else joined
        try {
          val chDir = writeChanges(changesFrom(pinned))
          val merged = mergedFrom(pinned)
          // SET * writes source rows (validated above); column-level
          // clauses synthesize new rows — gate them before anything lands
          if (matchedSet.nonEmpty || insertSet.nonEmpty)
            enforceConstraints(merged, m.constraints)
          // pass m.pcol explicitly: a partitioned table taking the
          // full-rewrite path (NOT MATCHED BY SOURCE sync) must come out the
          // other side still partitioned — Hive layout, SHOW PARTITIONS and
          // replaceWhere ownership all key off the manifest's pcol
          replaceAll(merged, m.pcol, "merge", Some(v0), () => chDir, txn = txn)
          maybeAutoCompact()
        } finally if (m.cdfEnabled) { pinned.unpersist(); () }
      case Some(p) =>
        // touched partitions = the source's partition values (small, driver-side)
        val touched = src.select(col(p).cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        require(!touched.contains(null), s"null partition value in column $p")
        val touchedSet = touched.toSet
        val joined = joinedOf(widen(readScoped(m, Some(touchedSet))))
        val pinned =
          if (m.cdfEnabled) joined.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else joined
        try {
          // same overlap as the unpartitioned arm: images ride their own
          // thread while the merged partitions are written
          val chDirF =
            if (m.cdfEnabled) inParallel { writeChanges(changesFrom(pinned)) }
            else () => Option.empty[String]
          val merged = mergedFrom(pinned)
          if (matchedSet.nonEmpty || insertSet.nonEmpty)
            enforceConstraints(merged, m.constraints)
          val (dir, owned, fstats) = writeData(merged, Some(p),
            m.statsCols, bloomCols = m.bloomCols, colMap = m.colMap)
          val chDir = chDirF()
          // PARTITION-DISJOINT CONCURRENT MERGES both commit without
          // recompute (Delta's partition-level conflict resolution): on a
          // lost CAS, REBASE instead of throwing when the interleaved
          // commits provably did not touch this merge's input — identical
          // schema/metadata and an identical (dir → touched-partition-value)
          // ownership map mean a recompute against the new snapshot would
          // read the same rows and write the same output, so the
          // already-written data dir is simply re-pointed at the new base
          // (kept entries and their stats re-derived from it). Anything
          // else — overlapping partitions, schema evolution in flight,
          // property/constraint/DV/txn drift — stays a
          // [[ConcurrentWriteException]]: the loser must recompute.
          def ownTouched(mm: Manifest): Set[(String, String)] =
            mm.entries.flatMap(e => e.owned.getOrElse(Seq.empty)
              .filter(touchedSet).map(v => (e.dir, v))).toSet
          def rebasable(mN: Manifest): Boolean =
            schema1 == m.schema && mN.schema == m.schema &&
              mN.pcol == m.pcol && mN.cdfEnabled == m.cdfEnabled &&
              mN.statsCols == m.statsCols && mN.bloomCols == m.bloomCols &&
              mN.colMap == m.colMap && mN.droppedCols == m.droppedCols &&
              mN.constraints == m.constraints && mN.generated == m.generated &&
              mN.props == m.props && mN.deleteVectors == m.deleteVectors &&
              mN.txns == m.txns && ownTouched(mN) == ownTouched(m)
          var base = m
          var baseV = v0
          var committed = false
          while (!committed) {
            val kept = base.entries
              .map(e => e.copy(owned = e.owned.map(_.filterNot(touchedSet))))
              .filter(_.owned.exists(_.nonEmpty))
            val keptDirs = kept.map(_.dir).toSet
            val keptStats = base.fileStats.filter(fs =>
              keptDirs.exists(d => fs.path.startsWith(d + "/")))
            // carry live deletion vectors: kept dirs' coordinates stay
            // valid; entries for replaced dirs are stale-but-harmless
            // (anti-join can't match a file no longer scanned)
            committed = tryCommit(Manifest(schema1, base.pcol,
              kept :+ DirEntry(dir, owned), "merge",
              base.cdfEnabled, chDir, statsCols = base.statsCols,
              txns = withTxnLedger(base.txns, txn), droppedCols = base.droppedCols,
              fileStats = keptStats ++ fstats, constraints = base.constraints,
              generated = base.generated, deleteVectors = base.deleteVectors,
              clusterKey = base.clusterKey,
              bloomCols = base.bloomCols, colMap = base.colMap,
              props = base.props), baseV + 1)
            if (!committed) {
              val vN = currentVersion
              val mN = readManifest(vN)
              // a concurrent replay of the SAME transaction won the race:
              // reclaim the unreferenced data dir and no-op
              if (txnAppliedIn(mN, txn)) {
                deleteRecursively(Paths.get(root, dir))
                Files.deleteIfExists(bloomIndexFile(dir))
                return
              }
              if (!rebasable(mN))
                throw new ConcurrentWriteException(
                  s"merge computed against version $v0 of $root, but a " +
                    s"concurrent writer committed conflicting changes by " +
                    s"v$vN — recompute and retry")
              base = mN
              baseV = vN
            }
          }
          // Delta fires auto-compact after MERGE too: partition-scoped
          // merges accumulate one dir per run, the small-file shape the
          // property exists to bound (best-effort, post-commit)
          maybeAutoCompact()
        } finally if (m.cdfEnabled) { pinned.unpersist(); () }
    }
  }

  /**
   * Copy-on-write DELETE (Delta `DELETE FROM ... WHERE`): remove the rows
   * matching the conjunction of `preds`, rewriting ONLY the files whose zone
   * map admits a match — every other file is re-referenced by hard link, so
   * I/O is O(files that may contain matches), not O(table). At 100 TB a
   * targeted delete (one doc id, one day) touches a handful of files when
   * the table records stats on the predicate column (ideally Z-ordered).
   * Returns the number of rows deleted. With change feed enabled the
   * deleted rows are materialized as `_change_type = 'delete'`.
   */
  def delete(preds: Seq[ZonePred]): Long = mutateWhere(preds, None)

  /**
   * MERGE-ON-READ DELETE (Delta deletion vectors): logically remove the
   * rows matching `condition` (a SQL boolean expression over the table's
   * columns) WITHOUT rewriting any data file. The matching rows' coordinates
   * — root-relative file path + in-file row index, Spark's
   * `_metadata.file_path`/`_metadata.row_index` — are written as a deletion
   * vector under `_dv/`, and every read anti-joins live vectors out of the
   * scan. At 100 TB this makes a point delete O(matched rows), not O(files
   * that may contain matches): the copy-on-write [[delete]] rewrites
   * whole files to drop one row; this writes a few coordinates.
   *
   * Semantics match [[delete]]: returns the number of rows deleted; with
   * change feed enabled the deleted rows are materialized as
   * `_change_type = 'delete'`. Deleting already-deleted rows is a no-op
   * (matching runs against the LIVE snapshot). Reads of every form —
   * [[read]], [[readWhere]], [[readVersion]], merge sources — apply the
   * vectors; full-rewrite commits (overwrite / compact / unpartitioned
   * merge) read through them and clear them. Later appends are untouched
   * by earlier vectors (coordinates are per existing file).
   *
   * The read-side anti-join broadcasts the vector set, so it is sized by
   * DELETED ROWS, not table size — a table accumulating large vectors
   * should `compact()` (Delta's `REORG TABLE ... APPLY (PURGE)`), which
   * materializes the deletes and clears the vectors.
   */
  def deleteWhere(condition: String): Long = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    val v0 = currentVersion
    val m = readManifest(v0)
    deleteRows(m, v0, coalesce(expr(condition), lit(false)),
      readScopedRows(m, None, withRowIds = true))
  }

  /**
   * MERGE-ON-READ POINT DELETE with file skipping — the merge-on-read twin
   * of the copy-on-write [[delete]]: the candidate scan is pruned by zone
   * maps AND the bloom index FIRST (the preds name which files can hold a
   * match), then the surviving rows are filtered by the same preds and
   * their coordinates written as a deletion vector. At 100 TB a keyed
   * delete on a stats/bloom-indexed column touches the handful of files
   * that can contain the key instead of scanning the table to locate the
   * rows it will not rewrite anyway. Semantics ≡ `deleteWhere(<preds as
   * conjunction>)` — pruning uses the same predicates row-filtering does,
   * so it can never miss a match.
   */
  def deleteWhere(preds: Seq[ZonePred]): Long = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    require(preds.nonEmpty, "refusing a whole-table delete with no predicate")
    preds.foreach(p => require(p.lo.isDefined || p.hi.isDefined,
      s"predicate on ${p.col} has neither a lower nor an upper bound — " +
        "an unbounded ZonePred matches every row (use delete() for a full rewrite)"))
    val v0 = currentVersion
    val m = readManifest(v0)
    preds.foreach(p => require(m.schema.fieldNames.contains(p.col),
      s"unknown predicate column ${p.col}"))
    deleteRows(m, v0, zonePredCondition(m, preds), readKeptRows(m, preds))
  }

  /** Conjunction of [[ZonePred]] bounds as a row-level Column. */
  private def zonePredCondition(m: Manifest, preds: Seq[ZonePred]): org.apache.spark.sql.Column =
    preds.map { pr =>
      val dt = m.schema(pr.col).dataType
      (pr.lo.map(v => col(pr.col) >= lit(v).cast(dt)).toSeq ++
        pr.hi.map(v => col(pr.col) <= lit(v).cast(dt)).toSeq)
        .reduce(_ && _)
    }.reduce(_ && _)

  /** Zone/bloom-pruned scan carrying row-id columns, deletion vectors
   *  applied — the candidate set for a pruned merge-on-read delete. */
  private def readKeptRows(m: Manifest, preds: Seq[ZonePred]): DataFrame = {
    val scans = planSkip(m, preds).flatMap { case (e, kept, _) =>
      val disowned = m.pcol.isDefined && e.owned.exists(_.isEmpty)
      if (kept.isEmpty || disowned) None
      else {
        val scan = toLogicalNames(m, rowIdCols(spark.read.schema(physSchema(m))
          .option("basePath", s"$root/${e.dir}")
          .parquet(kept.map(f => s"$root/$f"): _*)))
        Some((m.pcol, e.owned) match {
          case (Some(p), Some(vs)) if vs.nonEmpty =>
            val dt = m.schema(p).dataType
            scan.filter(vs.map(v => col(p) === lit(v).cast(dt)).reduce(_ || _))
          case _ => scan
        })
      }
    }
    scans.reduceOption(_ unionByName _) match {
      case None => readScopedRows(m, Some(Set.empty), withRowIds = true)
        .limit(0) // no file can hold a match: empty, schema-correct
      case Some(df) => antiJoinDeleteVectors(df, m)
    }
  }

  private def deleteRows(m: Manifest, v0: Long,
      cond: org.apache.spark.sql.Column, live: DataFrame): Long = {
    val matches = live.filter(cond)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dvDir = s"_dv/${UUID.randomUUID()}"
      // the delete images and the DV coordinates are independent projections
      // of the pinned matches: write the images on their own thread so the
      // two jobs overlap (both dirs are vacuumable orphans if either fails)
      val chDirF: () => Option[String] =
        if (m.cdfEnabled) inParallel {
          val d = s"_changes/${UUID.randomUUID()}"
          toPhysicalNames(m, matches.select(m.schema.fieldNames.map(col).toSeq: _*)
            .withColumn(ChangeTypeCol, lit("delete")))
            .write.parquet(s"$root/$d")
          Some(d)
        } else () => None
      matches.select(col(DvFileCol).as("file"), col(DvPosCol).as("pos"))
        .write.parquet(s"$root/$dvDir")
      // count the coordinates from the written files' FOOTERS — the old
      // read-back count was one more Spark job per delete for a number
      // the parquet metadata already records exactly
      val matched = parquetRowCount(Paths.get(root, dvDir)).getOrElse(
        spark.read.schema(DvSchema).parquet(s"$root/$dvDir").count())
      if (matched == 0) {
        deleteRecursively(Paths.get(root, dvDir))
        chDirF().foreach(d => deleteRecursively(Paths.get(root, d)))
        return 0L
      }
      val chDir = chDirF()
      if (!tryCommit(m.copy(op = "delete", cdfDir = chDir, commitTsMs = None,
          deleteVectors = m.deleteVectors :+ dvDir), v0 + 1))
        throw new ConcurrentWriteException(
          s"delete computed against version $v0 of $root, but a concurrent " +
            s"writer committed v${v0 + 1} first — recompute and retry")
      matched
    } finally { matches.unpersist(); () }
  }

  /** Live deletion-vector dirs of the current snapshot (empty once a
   *  rewrite materializes them). */
  def deleteVectorDirs: Seq[String] = manifest.deleteVectors

  /**
   * REPLACE WHERE (Delta's `replaceWhere` / SQL `INSERT INTO ... REPLACE
   * WHERE`): atomically delete every row matching `condition` and insert
   * `df0` — ONE commit, so readers see either the old region or the new,
   * never a gap. Delta's write-side contract is enforced: every incoming
   * row must itself satisfy the predicate (a replace that smuggles rows
   * outside its region would corrupt downstream incremental consumers).
   * Merge-on-read: matched old rows are deletion-vectored, the new data
   * lands as a fresh dir — cost O(matched rows + new data) at any table
   * size, no untouched file is rewritten. The change feed records
   * delete + insert images. Returns the number of rows replaced (deleted).
   *
   * For a predicate over the PARTITION column use [[overwritePartitions]]:
   * it transfers manifest ownership without scanning any existing data.
   */
  def overwriteWhere(condition: String, df0: DataFrame): Long = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    val v0 = currentVersion
    val m = readManifest(v0)
    val cols = m.schema.fieldNames.toSeq
    val df = materializeGenerated(df0, m)
    require(df.columns.toSet == cols.toSet,
      s"replace batch columns ${df.columns.sorted.mkString(",")} != table " +
        s"schema ${cols.sorted.mkString(",")}")
    val cond = coalesce(expr(condition), lit(false))
    val data = df.select(cols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      require(data.filter(!cond).limit(1).count() == 0L,
        s"replaceWhere contract: every incoming row must satisfy '$condition'")
      enforceConstraints(data, m.constraints)
      val matches = readScopedRows(m, None, withRowIds = true).filter(cond)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val dvDir = s"_dv/${UUID.randomUUID()}"
        // three independent consumers of the two pinned frames — DV
        // coordinates, change images, new data — overlap all three writes
        val chDirF: () => Option[String] =
          if (m.cdfEnabled) inParallel {
            val d = s"_changes/${UUID.randomUUID()}"
            toPhysicalNames(m, matches.select(cols.map(col): _*)
              .withColumn(ChangeTypeCol, lit("delete"))
              .unionByName(data.withColumn(ChangeTypeCol, lit("insert"))))
              .write.parquet(s"$root/$d")
            Some(d)
          } else () => None
        val dvF = inParallel {
          matches.select(col(DvFileCol).as("file"), col(DvPosCol).as("pos"))
            .write.parquet(s"$root/$dvDir")
        }
        val (dir, owned, fstats) =
          writeData(data, m.pcol, m.statsCols, bloomCols = m.bloomCols,
            colMap = m.colMap)
        dvF()
        val replaced = parquetRowCount(Paths.get(root, dvDir)).getOrElse(
          spark.read.schema(DvSchema).parquet(s"$root/$dvDir").count())
        val chDir = chDirF()
        if (!tryCommit(m.copy(op = "replace", cdfDir = chDir, commitTsMs = None,
            entries = m.entries :+ DirEntry(dir, owned),
            fileStats = m.fileStats ++ fstats,
            deleteVectors = m.deleteVectors :+ dvDir), v0 + 1))
          throw new ConcurrentWriteException(
            s"replace computed against version $v0 of $root, but a concurrent " +
              s"writer committed v${v0 + 1} first — recompute and retry")
        replaced
      } finally { matches.unpersist(); () }
    } finally { data.unpersist(); () }
  }

  /**
   * PARTITION REPLACEMENT — the zero-scan fast path of [[overwriteWhere]]
   * for predicates over the partition column (the nightly "reload
   * yesterday's partition" shape): manifest ownership of the matching
   * partition values transfers to the freshly written dir, every other
   * entry is carried UNCHANGED (same paths, same inodes, like
   * [[optimizeWhere]]), and no existing data is read at all — cost is
   * O(new data) + O(manifest), independent of table size. Incoming rows
   * must all fall inside the replaced partition range (Delta's replaceWhere
   * contract). Deletion vectors over replaced partitions become inert
   * (their coordinates address disowned files); vectors over untouched
   * partitions stay live.
   */
  def overwritePartitions(preds: Seq[ZonePred], df0: DataFrame): Unit =
    synchronized {
      require(exists, s"LakeTable at $root does not exist")
      val v0 = currentVersion
      val m = readManifest(v0)
      val p = m.pcol.getOrElse(throw new IllegalArgumentException(
        "overwritePartitions needs a partitioned table — use overwriteWhere"))
      require(preds.nonEmpty, "overwritePartitions with no predicate")
      preds.foreach(pr => require(pr.col == p,
        s"overwritePartitions must predicate only the partition column $p, " +
          s"got ${pr.col}"))
      val cols = m.schema.fieldNames.toSeq
      val df = materializeGenerated(df0, m)
      require(df.columns.toSet == cols.toSet,
        s"replace batch columns ${df.columns.sorted.mkString(",")} != table " +
          s"schema ${cols.sorted.mkString(",")}")
      val dt = m.schema(p).dataType
      val inScope = preds.map { pr =>
        pr.lo.map(v => col(p) >= lit(v).cast(dt)).getOrElse(lit(true)) &&
        pr.hi.map(v => col(p) <= lit(v).cast(dt)).getOrElse(lit(true))
      }.reduce(_ && _)
      val data = df.select(cols.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        require(data.filter(!coalesce(inScope, lit(false))).limit(1).count() == 0L,
          "replaceWhere contract: every incoming row must fall inside the " +
            s"replaced partition range on $p")
        enforceConstraints(data, m.constraints)
        val (dir, owned, fstats) =
          writeData(data, m.pcol, m.statsCols, bloomCols = m.bloomCols,
            colMap = m.colMap)
        val numeric = dt.isInstanceOf[org.apache.spark.sql.types.NumericType]
        def cmp(a: String, b: String): Int =
          if (!numeric) a.compareTo(b)
          else try BigDecimal(a).compare(BigDecimal(b))
          catch { case _: NumberFormatException => 0 }
        def replaced(v: String): Boolean = preds.forall(pr =>
          pr.lo.forall(l => cmp(v, l) >= 0) && pr.hi.forall(h => cmp(v, h) <= 0))
        val keptEntries = m.entries.flatMap { e =>
          val rest = e.owned.map(_.filterNot(replaced))
          if (rest.exists(_.isEmpty)) None else Some(e.copy(owned = rest))
        }
        val keptDirs = keptEntries.map(_.dir).toSet
        val keptStats = m.fileStats
          .filter(fs => keptDirs.exists(d => fs.path.startsWith(d + "/")))
        val chDir =
          if (m.cdfEnabled) {
            // CDF needs the replaced rows' delete images: read ONLY the
            // replaced partitions (partition-pruned — the zero-scan promise
            // relaxes to O(replaced region) exactly when CDF demands it)
            val scope = m.entries.flatMap(_.owned.getOrElse(Nil))
              .distinct.filter(replaced).toSet
            val d = s"_changes/${UUID.randomUUID()}"
            toPhysicalNames(m, readScoped(m, Some(scope))
              .select(cols.map(col): _*)
              .withColumn(ChangeTypeCol, lit("delete"))
              .unionByName(data.withColumn(ChangeTypeCol, lit("insert"))))
              .write.parquet(s"$root/$d")
            Some(d)
          } else None
        if (!tryCommit(Manifest(m.schema, m.pcol,
            keptEntries :+ DirEntry(dir, owned), "replace", m.cdfEnabled, chDir,
            m.statsCols, keptStats ++ fstats, txns = m.txns,
            droppedCols = m.droppedCols,
            constraints = m.constraints,
            generated = m.generated, deleteVectors = m.deleteVectors,
            bloomCols = m.bloomCols, colMap = m.colMap, props = m.props,
            clusterKey = m.clusterKey), v0 + 1))
          throw new ConcurrentWriteException(
            s"replace computed against version $v0 of $root, but a concurrent " +
              s"writer committed v${v0 + 1} first — recompute and retry")
      } finally { data.unpersist(); () }
    }

  /**
   * Copy-on-write UPDATE (Delta `UPDATE ... SET ... WHERE`): assign
   * `set` (column → expression over the row) on rows matching `preds`,
   * with the same zone-map-pruned file rewrite as [[delete]]. The partition
   * column cannot be assigned (a row may not change partition). Returns the
   * number of rows updated; change feed records pre/post images.
   */
  def update(preds: Seq[ZonePred], set: Map[String, Column]): Long =
    mutateWhere(preds, Some(set))

  private def mutateWhere(preds: Seq[ZonePred],
      set: Option[Map[String, Column]]): Long = synchronized {
    require(preds.nonEmpty, "refusing a whole-table mutation with no predicate")
    val v0 = currentVersion
    val m = readManifest(v0)
    val opName = if (set.isEmpty) "delete" else "update"
    // CoW rewrites read raw files and re-link untouched ones under new dirs —
    // both would resurrect rows a live deletion vector has removed. Delta
    // draws the same line (REORG ... APPLY (PURGE) before incompatible ops).
    require(m.deleteVectors.isEmpty,
      s"copy-on-write $opName on $root with live deletion vectors — " +
        "compact() first to materialize them, or use deleteWhere()")
    preds.foreach(p => require(m.schema.fieldNames.contains(p.col),
      s"unknown predicate column ${p.col}"))
    set.foreach(_.keys.foreach { c =>
      require(m.schema.fieldNames.contains(c), s"unknown update column $c")
      require(!m.pcol.contains(c), s"cannot update partition column $c")
    })
    val cols = m.schema.fieldNames.toSeq
    val cond = preds.map { pr =>
      val dt = m.schema(pr.col).dataType
      (pr.lo.map(v => col(pr.col) >= lit(v).cast(dt)).toSeq ++
        pr.hi.map(v => col(pr.col) <= lit(v).cast(dt)).toSeq)
        .reduce(_ && _)
    }.reduce(_ && _)

    val plan = planSkip(m, preds)
    var matched = 0L
    val newEntries = scala.collection.mutable.ArrayBuffer.empty[DirEntry]
    val newStats = scala.collection.mutable.ArrayBuffer.empty[FileStat]
    val changeParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    plan.foreach { case (e, touched, _) =>
      if (touched.isEmpty) {
        // no file in this dir can hold a match: re-reference as-is
        newEntries += e
        newStats ++= m.fileStats.filter(_.path.startsWith(e.dir + "/"))
      } else {
        val newDir = s"data/${UUID.randomUUID()}"
        Files.createDirectories(Paths.get(root, newDir))
        // 1. hard-link every untouched file (zero data I/O), keeping the
        //    partition subpath so basePath reads still recover the pcol
        val touchedSet = touched.toSet
        val all = listParquet(Paths.get(root, e.dir))
          .map(p => Paths.get(root).relativize(p).toString)
        all.filterNot(touchedSet).foreach { f =>
          val rel = Paths.get(e.dir).relativize(Paths.get(f))
          val dst = Paths.get(root, newDir).resolve(rel)
          Files.createDirectories(dst.getParent)
          Files.createLink(dst, Paths.get(root, f))
          m.fileStats.find(_.path == f).foreach { fs =>
            newStats += fs.copy(path = s"$newDir/$rel")
          }
        }
        // 2. rewrite the touched files with the mutation applied
        val touchedDf = toLogicalNames(m, spark.read.schema(physSchema(m))
          .option("basePath", s"$root/${e.dir}")
          .parquet(touched.map(f => s"$root/$f"): _*))
        matched += touchedDf.filter(cond).count()
        val rewritten = set match {
          case None => touchedDf.filter(!coalesce(cond, lit(false)))
          case Some(assigns) => touchedDf.select(cols.map { c =>
            assigns.get(c) match {
              case Some(expr0) => when(coalesce(cond, lit(false)), expr0)
                .otherwise(col(c)).as(c)
              case None => col(c)
            }
          }: _*)
        }
        // UPDATE can write new values: enforce CHECK constraints on the
        // rewritten rows before any file lands (DELETE can't violate).
        // A failure before commit leaves only uncommitted dirs (vacuumable).
        if (set.nonEmpty) enforceConstraints(rewritten, m.constraints)
        if (m.cdfEnabled) {
          val pinned = touchedDf.filter(cond)
          changeParts += (set match {
            case None => pinned.withColumn(ChangeTypeCol, lit("delete"))
            case Some(assigns) =>
              pinned.withColumn(ChangeTypeCol, lit("update_preimage"))
                .unionByName(pinned.select(cols.map { c =>
                  assigns.get(c).map(x => x.as(c)).getOrElse(col(c))
                }: _*).withColumn(ChangeTypeCol, lit("update_postimage")))
          })
        }
        val rwTmp = s"data/.rw-${UUID.randomUUID()}"
        // preserve partition subdirs for partitioned tables; files are
        // written under PHYSICAL column names (column-mapping boundary)
        val rewrittenP = toPhysicalNames(m, rewritten)
        withMicrosTimestamps { m.pcol.map(physName(m, _)) match {
          case Some(p) => rewrittenP.repartition(col(p))
            .write.partitionBy(p).parquet(s"$root/$rwTmp")
          case None => rewrittenP.write.parquet(s"$root/$rwTmp")
        } }
        val rwFiles = listParquet(Paths.get(root, rwTmp))
        rwFiles.foreach { src =>
          val rel = Paths.get(root, rwTmp).relativize(src)
          val dst = Paths.get(root, newDir).resolve(rel)
          Files.createDirectories(dst.getParent)
          Files.createLink(dst, src)
        }
        // stats for just the rewritten files (linked files kept theirs)
        val rwRel = rwFiles.map(src =>
          s"$newDir/${Paths.get(root, rwTmp).relativize(src)}")
        if (m.statsCols.nonEmpty && rwRel.nonEmpty) {
          // footers of the freshly rewritten files (read via the rwTmp
          // paths — same inodes as the hard links under newDir)
          newStats ++= footerStats(rwFiles.zip(rwRel), physSchema(m),
            m.pcol.map(physName(m, _)), m.statsCols.map(physName(m, _)))
            .getOrElse {
              val rwDf = spark.read.schema(physSchema(m))
                .option("basePath", s"$root/$newDir")
                .parquet(rwRel.map(f => s"$root/$f"): _*)
              statsOf(rwDf, newDir, physSchema(m),
                m.pcol.map(physName(m, _)), m.statsCols.map(physName(m, _)))
            }
        }
        deleteRecursively(Paths.get(root, rwTmp))
        newEntries += DirEntry(newDir, e.owned)
      }
    }
    val chDir =
      if (m.cdfEnabled && changeParts.nonEmpty) {
        val d = s"_changes/${UUID.randomUUID()}"
        toPhysicalNames(m, changeParts.reduce(_ unionByName _))
          .write.parquet(s"$root/$d")
        Some(d)
      } else None
    if (!tryCommit(Manifest(m.schema, m.pcol, newEntries.toSeq, opName,
        m.cdfEnabled, chDir, m.statsCols, newStats.toSeq, txns = m.txns,
        droppedCols = m.droppedCols,
        constraints = m.constraints, generated = m.generated,
        bloomCols = m.bloomCols, colMap = m.colMap, props = m.props,
        clusterKey = m.clusterKey), v0 + 1))
      throw new ConcurrentWriteException(
        s"$opName computed against version $v0 of $root, but a concurrent " +
          s"writer committed v${v0 + 1} first — recompute and retry")
    matched
  }

  /**
   * MERGE-ON-READ UPDATE (the deletion-vector twin of the copy-on-write
   * [[update]], Delta's DV-enabled `UPDATE`): assign `set` on rows matching
   * `condition` — an ARBITRARY SQL boolean expression over the table's
   * columns, not just zone-expressible bounds — WITHOUT rewriting any
   * existing data file. One commit carries both halves: the matched rows'
   * coordinates land in a deletion vector (the old images vanish from every
   * read) and the updated images are appended as a fresh data dir. At
   * 100 TB this is O(matched rows) like [[deleteWhere]], where the CoW
   * [[update]] is O(files that may contain matches) — and unlike the CoW
   * path it composes with live deletion vectors (no `compact()` first).
   *
   * Semantics: CHECK constraints are enforced on the updated images before
   * anything is written; GENERATED columns are recomputed from their
   * expressions (assigning one directly is an error — its value is derived,
   * not set), so an update that moves a row's generated partition value
   * lands the new image in the right partition dir. With change feed
   * enabled the commit records `update_preimage`/`update_postimage` rows.
   * Returns the number of rows updated.
   */
  def updateWhere(condition: String, set: Map[String, Column]): Long = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    require(set.nonEmpty, "UPDATE with no SET assignments")
    val v0 = currentVersion
    val m = readManifest(v0)
    set.keys.foreach { c =>
      require(m.schema.fieldNames.contains(c), s"unknown update column $c")
      require(!m.generated.exists(_._1 == c),
        s"$c is a generated column — it is recomputed from its expression, not assigned")
    }
    val cols = m.schema.fieldNames.toSeq
    val cond = coalesce(expr(condition), lit(false))
    val matches = readScopedRows(m, None, withRowIds = true).filter(cond)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dvDir = s"_dv/${UUID.randomUUID()}"
      matches.select(col(DvFileCol).as("file"), col(DvPosCol).as("pos"))
        .write.parquet(s"$root/$dvDir")
      // count the coordinates from the written files' FOOTERS — the old
      // read-back count was one more Spark job per delete for a number
      // the parquet metadata already records exactly
      val matched = parquetRowCount(Paths.get(root, dvDir)).getOrElse(
        spark.read.schema(DvSchema).parquet(s"$root/$dvDir").count())
      if (matched == 0) {
        deleteRecursively(Paths.get(root, dvDir))
        return 0L
      }
      val genCols = m.generated.map(_._1).toSet
      val assigned = matches.select(cols.filterNot(genCols).map { c =>
        set.get(c).map(_.as(c)).getOrElse(col(c))
      }: _*)
      val updated = materializeGenerated(assigned, m)
        .select(cols.map(col): _*)
      enforceConstraints(updated, m.constraints)
      // pre/post images derive from the SAME pinned matches as the updated
      // data: write them on their own thread, overlapping the data write
      val chDirF: () => Option[String] =
        if (m.cdfEnabled) inParallel {
          val d = s"_changes/${UUID.randomUUID()}"
          toPhysicalNames(m, matches.select(cols.map(col): _*)
            .withColumn(ChangeTypeCol, lit("update_preimage"))
            .unionByName(updated.withColumn(ChangeTypeCol, lit("update_postimage"))))
            .write.parquet(s"$root/$d")
          Some(d)
        } else () => None
      val (dir, owned, fstats) =
        writeData(updated, m.pcol, m.statsCols, bloomCols = m.bloomCols,
          colMap = m.colMap)
      val chDir = chDirF()
      if (!tryCommit(m.copy(op = "update", cdfDir = chDir, commitTsMs = None,
          entries = m.entries :+ DirEntry(dir, owned),
          fileStats = m.fileStats ++ fstats,
          deleteVectors = m.deleteVectors :+ dvDir), v0 + 1))
        throw new ConcurrentWriteException(
          s"update computed against version $v0 of $root, but a concurrent " +
            s"writer committed v${v0 + 1} first — recompute and retry")
      matched
    } finally { matches.unpersist(); () }
  }

  /** Drop data dirs (and change-feed dirs, including race-orphaned ones) not
   *  referenced by the newest `keepVersions` manifests. */
  def vacuum(keepVersions: Int = 2): Unit = synchronized {
    if (!exists) return
    reclaimExcept(retainedByVersions(keepVersions))
  }

  /** DRY RUN of [[vacuum]] (Delta `VACUUM ... DRY RUN`): the root-relative
   *  dirs/sidecars the real pass would delete, deleting nothing. */
  def vacuumDryRun(keepVersions: Int = 2): Seq[String] = synchronized {
    if (!exists) Nil else reclaimCandidates(retainedByVersions(keepVersions))
  }

  private def retainedByVersions(keepVersions: Int): Seq[Manifest] = {
    val cur = currentVersion
    (math.max(0L, cur - keepVersions + 1) to cur)
      .filter(v => Files.exists(manifestFile(v)))
      .map(readManifest)
  }

  /**
   * VACUUM by wall-clock retention (Delta `VACUUM t RETAIN n HOURS`): drop
   * data no version committed within the last `hours` references. Time
   * travel to any commit inside the window keeps working; older versions'
   * histories stay listable but their data is reclaimed. The CURRENT
   * version is always retained regardless of its age (a quiet table must
   * never lose its live snapshot), and manifests written before commit
   * clocks existed are retained conservatively (their age cannot be
   * proven). Like Delta's retention-duration check, windows shorter than
   * [[LakeTable.MinRetentionHours]] are refused unless `force` — a reader
   * of an old snapshot could still be mid-scan — so short-window tests and
   * deliberate purges opt in explicitly.
   */
  def vacuumRetainHours(hours: Double, force: Boolean = false): Unit = synchronized {
    if (!exists) return
    reclaimExcept(retainedByHours(hours, force))
  }

  /** DRY RUN of [[vacuumRetainHours]]: what it would delete, deleting
   *  nothing. The same retention floor applies — a dry run must report what
   *  a PERMITTED vacuum would do, not preview a refused one. */
  def vacuumRetainHoursDryRun(hours: Double, force: Boolean = false): Seq[String] =
    synchronized {
      if (!exists) Nil else reclaimCandidates(retainedByHours(hours, force))
    }

  private def retainedByHours(hours: Double, force: Boolean): Seq[Manifest] = {
    require(hours >= 0, s"retention hours must be >= 0, got $hours")
    require(force || hours >= MinRetentionHours,
      f"retention of $hours%.1f h is below the ${MinRetentionHours}h safety " +
        "floor (a reader of an old snapshot may still be mid-scan) — " +
        "pass force = true to override")
    val cutoffMs = clock() - (hours * 3600 * 1000).toLong
    val cur = currentVersion
    (0L to cur)
      .filter(v => Files.exists(manifestFile(v)))
      .filter(v => v == cur || manifestHeader(v)._2.forall(_ >= cutoffMs))
      .map(readManifest)
  }

  /** Reclaim every data/change/DV dir and bloom sidecar not referenced by
   *  one of `retained` — the shared sweep of both vacuum forms. */
  private def reclaimExcept(retained: Seq[Manifest]): Unit =
    reclaimCandidates(retained).foreach(d => deleteRecursively(Paths.get(root, d)))

  /** The root-relative dirs/sidecars [[reclaimExcept]] would delete given
   *  the retained manifest set — the DRY RUN listing, shared with the real
   *  pass so the two can never disagree. */
  private def reclaimCandidates(retained: Seq[Manifest]): Seq[String] = {
    val out = Seq.newBuilder[String]
    def sweep(sub: String, keep: Set[String]): Unit = {
      val dir = Paths.get(root, sub)
      if (Files.isDirectory(dir)) {
        Files.list(dir).iterator().asScala.toList.foreach { p =>
          if (!keep.contains(s"$sub/${p.getFileName}")) out += s"$sub/${p.getFileName}"
        }
      }
    }
    val keep = retained.flatMap(_.entries.map(_.dir)).toSet
    sweep("data", keep)
    sweep("_changes", retained.flatMap(_.cdfDir).toSet)
    sweep("_dv", retained.flatMap(_.deleteVectors).toSet)
    // bloom sidecars live and die with their data dir
    sweep("_bloom", keep.map(d => s"_bloom/${Paths.get(d).getFileName}.idx"))
    out.result()
  }

  /** Rewrite the whole table into a single dir (small-file compaction for
   *  tables that accumulated many append/merge dirs). */
  def compact(): Unit = synchronized {
    val v0 = currentVersion
    val m = readManifest(v0)
    replaceAll(readScoped(m, None), m.pcol, "compact", Some(v0))
  }

  /** [[optimizeCompact]] result: what was rewritten vs carried by link. */
  final case class OptimizeStats(
      filesRewritten: Int, filesLinked: Int, bytesRewritten: Long)

  /** Whether [[optimizeCompact]] would actually improve the layout: live
   *  deletion vectors exist (the pack materializes them), or at least two
   *  files sit under the small-file threshold (one lone small file can't
   *  pack into fewer). Maintenance jobs probe this FIRST — an
   *  already-packed table skips the pass entirely instead of paying an
   *  O(files) relink every night. Driver-side listing only. */
  def needsCompaction(targetFileBytes: Long = 128L * 1024 * 1024): Boolean =
    synchronized {
      require(exists, s"LakeTable at $root does not exist")
      val m = manifest
      if (m.deleteVectors.nonEmpty) return true
      val minSize = targetFileBytes / 2
      var small = 0
      m.entries.foreach { e =>
        listParquet(Paths.get(root, e.dir)).foreach { p =>
          if (Files.size(p) < minSize) small += 1
          if (small >= 2) return true
        }
      }
      false
    }

  /**
   * OPTIMIZE bin-packing (Delta `OPTIMIZE` without ZORDER): coalesce SMALL
   * files into ~`targetFileBytes` files and hard-link every already-large
   * file untouched — I/O is O(small files), not O(table), which is the cost
   * that matters when streaming ingest has accumulated thousands of tiny
   * appends. [[compact]] stays the full-rewrite (REORG) path.
   *
   *  - "small" = under `targetFileBytes / 2` (Delta's minFileSize rule).
   *  - Partitioned tables pack PER PARTITION (files cannot cross partition
   *    dirs); files of partitions an entry no longer owns are dropped, not
   *    carried.
   *  - Files carrying DELETION-VECTOR rows are force-rewritten through the
   *    vector filter regardless of size — a hard link would put the dead
   *    rows under a new path the vectors don't address — so a completed
   *    optimize also MATERIALIZES all deletes and clears the vectors (the
   *    targeted `REORG TABLE ... APPLY (PURGE)`).
   *  - Zone-map stats ride along: linked files keep theirs (path remap),
   *    rewritten files get fresh ones. Bloom sidecars are rebuilt over the
   *    packed dir when the table indexes bloom columns (one extra scan —
   *    the write-side cost every indexed write pays).
   *
   * Commits conditionally against the snapshot it read (lost race →
   * [[ConcurrentWriteException]], recompute and retry). Rewrite-class
   * commit, but ROWSET-PRESERVING: the change feed spans it (it emits no
   * change rows — ChangeFeedSpec pins this), while append-only FILE streams
   * still refuse histories containing it (rewritten files would replay as
   * duplicates; same contract as compact). That makes auto-compact and
   * `readStream` mutually exclusive on one table — see the
   * [[LakeTable.AutoCompactProp]] note and the readStream error text.
   */
  def optimizeCompact(targetFileBytes: Long = 128L * 1024 * 1024): OptimizeStats =
    synchronized {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(exists, s"LakeTable at $root does not exist")
    val v0 = currentVersion
    val m = readManifest(v0)
    val minSize = targetFileBytes / 2
    val dvFiles: Set[String] =
      if (m.deleteVectors.isEmpty) Set.empty
      else spark.read.schema(DvSchema)
        .parquet(m.deleteVectors.map(d => s"$root/$d"): _*)
        .select("file").distinct().collect().map(_.getString(0)).toSet

    val newDir = s"data/${UUID.randomUUID()}"
    Files.createDirectories(Paths.get(root, newDir))
    // per entry: owned-partition files only; small-or-deleted → rewrite,
    // the rest hard-link into the packed dir (Spark part-file names embed a
    // job UUID, so cross-dir links cannot collide)
    var linked = 0
    var rewriteBytes = 0L
    val rewriteByDir = scala.collection.mutable.Map.empty[String, Seq[String]]
    val newStats = scala.collection.mutable.ArrayBuffer.empty[FileStat]
    m.entries.foreach { e =>
      val ownedVals = e.owned.map(_.toSet)
      listParquet(Paths.get(root, e.dir)).foreach { p =>
        val rel = Paths.get(root).relativize(p).toString
        val sub = Paths.get(root, e.dir).relativize(p).toString
        val inOwned = (m.pcol.map(physName(m, _)), ownedVals) match {
          case (Some(pc), Some(vs)) =>
            partitionValueOf(sub, pc).exists(vs.contains)
          case _ => true
        }
        if (inOwned) {
          if (Files.size(p) < minSize || dvFiles.contains(rel)) {
            rewriteBytes += Files.size(p)
            rewriteByDir(e.dir) = rewriteByDir.getOrElse(e.dir, Nil) :+ rel
          } else {
            val dst = Paths.get(root, newDir).resolve(sub)
            Files.createDirectories(dst.getParent)
            Files.createLink(dst, p)
            linked += 1
            m.fileStats.find(_.path == rel).foreach { fs =>
              newStats += fs.copy(path = s"$newDir/$sub")
            }
          }
        }
      }
    }
    val rewritten = rewriteByDir.toSeq.sortBy(_._1).map { case (dir, rels) =>
      val scan0 = spark.read.schema(physSchema(m))
        .option("basePath", s"$root/$dir")
        .parquet(rels.map(f => s"$root/$f"): _*)
      toLogicalNames(m, if (m.deleteVectors.isEmpty) scan0 else rowIdCols(scan0))
    } match {
      case Nil => None
      case scans => Some(antiJoinDeleteVectors(
        scans.reduce(_ unionByName _), m)
        .select(m.schema.fieldNames.map(col).toSeq: _*))
    }
    var rewrittenCount = 0
    rewritten.foreach { df =>
      val rwTmp = s"data/.opt-${UUID.randomUUID()}"
      val dfP = toPhysicalNames(m, df)
      withMicrosTimestamps { m.pcol.map(physName(m, _)) match {
        case Some(p) => dfP.repartition(col(p))
          .write.partitionBy(p).parquet(s"$root/$rwTmp")
        case None =>
          val n = math.max(1, math.ceil(rewriteBytes.toDouble / targetFileBytes).toInt)
          dfP.coalesce(n).write.parquet(s"$root/$rwTmp")
      } }
      val rwFiles = listParquet(Paths.get(root, rwTmp))
      rwFiles.foreach { src =>
        val sub = Paths.get(root, rwTmp).relativize(src)
        val dst = Paths.get(root, newDir).resolve(sub)
        Files.createDirectories(dst.getParent)
        Files.createLink(dst, src)
      }
      rewrittenCount = rwFiles.size
      if (m.statsCols.nonEmpty && rwFiles.nonEmpty) {
        val rwRel = rwFiles.map(src =>
          s"$newDir/${Paths.get(root, rwTmp).relativize(src)}")
        newStats ++= footerStats(rwFiles.zip(rwRel), physSchema(m),
          m.pcol.map(physName(m, _)), m.statsCols.map(physName(m, _)))
          .getOrElse {
            val rwDf = spark.read.schema(physSchema(m))
              .option("basePath", s"$root/$newDir")
              .parquet(rwRel.map(f => s"$root/$f"): _*)
            statsOf(rwDf, newDir, physSchema(m),
              m.pcol.map(physName(m, _)), m.statsCols.map(physName(m, _)))
          }
      }
      deleteRecursively(Paths.get(root, rwTmp))
    }
    // owned values for the packed dir = the union of what the entries owned
    val owned = m.pcol.map(_ => m.entries.flatMap(_.owned.getOrElse(Nil)).distinct)
    writeBloomIndex(newDir, physSchema(m), m.pcol.map(physName(m, _)),
      m.bloomCols.map(physName(m, _)))
    if (!tryCommit(Manifest(m.schema, m.pcol, Seq(DirEntry(newDir, owned)),
        "optimize", m.cdfEnabled, None, m.statsCols, newStats.toSeq,
        txns = m.txns, droppedCols = m.droppedCols,
        constraints = m.constraints, generated = m.generated,
        bloomCols = m.bloomCols, colMap = m.colMap, props = m.props,
        clusterKey = m.clusterKey), v0 + 1))
      throw new ConcurrentWriteException(
        s"optimize computed against version $v0 of $root, but a concurrent " +
          s"writer committed v${v0 + 1} first — recompute and retry")
    OptimizeStats(rewrittenCount, linked, rewriteBytes)
  }

  /** Hive-layout partition value of a file's dir-relative subpath, if any. */
  private def partitionValueOf(sub: String, pcol: String): Option[String] = {
    val prefix = s"$pcol="
    sub.split('/').find(_.startsWith(prefix))
      .map(s => LakeTable.unescapePathName(s.stripPrefix(prefix)))
  }

  /**
   * Z-ORDER compaction (Delta `OPTIMIZE ... ZORDER BY`): rewrite the table
   * clustered on the interleaved-bit order of `zcols`, so the per-file zone
   * maps become selective on EVERY z-ordered column at once — a linear sort
   * clusters only its leading column; Z-order gives each of k columns
   * ~(1/file_count)^(1/k) selectivity. The payoff is [[readWhere]] skipping
   * on whichever of the columns a query filters.
   *
   * Mechanics: each column is quantized to an 8-bit bin via approximate
   * quantile boundaries (equi-DEPTH bins, so skew cannot collapse the curve
   * into a few bins), bits of the bin indices are interleaved into a z-value,
   * and the table is range-repartitioned + sorted by it into `targetFiles`
   * files. The quantile sketch is one pass; the rewrite is one shuffle —
   * O(table), same as any compaction, and worth it when read volume
   * dominates write volume.
   *
   * Partitioned tables Z-order WITHIN each partition: bin boundaries are
   * computed PER PARTITION in one grouped `percentile_approx` pass (a June
   * partition's timestamps span June — global boundaries would collapse
   * every partition's rows into one or two bins), broadcast-joined back,
   * and the rewrite range-partitions on (partition, z) so each partition's
   * z-curve is contiguous across its files. Columns must be numeric,
   * timestamp, or date.
   */
  def compactZOrder(zcols: Seq[String], targetFiles: Int = 16): Unit = synchronized {
    val v0 = currentVersion
    val m = readManifest(v0)
    val (clustered, release) =
      zorderClustered(readScoped(m, None), m, zcols, targetFiles)
    try replaceAll(clustered, m.pcol, "compact", Some(v0),
      preclustered = m.pcol.isDefined, clusteredAs = zcols)
    finally release()
  }

  /** Lexicographic range-clustering compact — the layout `OPTIMIZE` applies
   *  to a liquid-clustered table whose key includes non-z-orderable columns
   *  (strings): range-repartition + sort on the column tuple, so each file
   *  covers a contiguous span of the leading key and zone maps prune on
   *  key prefixes. One sample pass (the range partitioner) + one shuffle —
   *  the same O(table) cost envelope as [[compactZOrder]]. Favors the
   *  LEADING columns (lexicographic), where the z-curve spreads locality
   *  evenly; pick the order accordingly. */
  def compactSort(cols: Seq[String], targetFiles: Int = 16): Unit = synchronized {
    val v0 = currentVersion
    val m = readManifest(v0)
    require(cols.nonEmpty && cols.size <= 4, "1..4 sort-cluster columns")
    cols.foreach { c =>
      require(m.schema.fieldNames.contains(c), s"unknown cluster column $c")
      require(!m.pcol.contains(c), s"$c is the partition column")
    }
    val clustered = readScoped(m, None)
      .repartitionByRange(targetFiles max 1, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
    replaceAll(clustered, m.pcol, "compact", Some(v0),
      preclustered = m.pcol.isDefined, clusteredAs = cols)
  }

  /**
   * INCREMENTAL liquid-clustering OPTIMIZE (Delta's actual `OPTIMIZE`
   * behavior on a clustered table): cluster ONLY the data written since the
   * last clustering pass, leaving already-clustered files untouched — same
   * paths, same inodes, no relink. At 100 TB this is the difference between
   * a nightly job that rewrites yesterday's ingest and one that rewrites
   * the table: cost is O(new data), independent of table size.
   *
   * Mechanics: manifest entries carry a `clustered` flag (set by the
   * clustering rewrites) plus the key they were clustered on
   * ([[Manifest.clusterKey]]). This pass reads the UNFLAGGED dirs (through
   * their deletion vectors — their dead rows materialize away), lays them
   * out on the key (bit-interleaved Z-order for z-orderable keys,
   * lexicographic range-sort otherwise), and commits a rewrite that
   * replaces only those entries. Vectors addressing kept files stay live;
   * vectors addressing rewritten files go stale-and-harmless (their paths
   * leave the manifest). A changed declared key (ALTER … CLUSTER BY)
   * invalidates the flags wholesale, so the next pass re-clusters
   * everything on the new key — Delta's `OPTIMIZE FULL` shape.
   *
   * Like Delta, incremental clustering is LOCAL: each pass lays out its own
   * batch well, but cross-batch key ranges overlap, so zone-map selectivity
   * degrades slowly as batches accumulate — `OPTIMIZE t FULL`
   * ([[compactZOrder]]/[[compactSort]]) restores the global curve.
   * Rowset-preserving "optimize" commit: the change feed spans it silently.
   */
  def optimizeClustered(cols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): OptimizeStats = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    require(cols.nonEmpty, "optimizeClustered needs clustering columns")
    val v0 = currentVersion
    val m = readManifest(v0)
    require(m.pcol.isEmpty,
      "liquid clustering applies to unpartitioned tables only")
    val keyMatches = m.clusterKey == cols
    val (kept, uncl) = m.entries.partition(e => e.clustered && keyMatches)
    if (uncl.isEmpty) return OptimizeStats(0,
      kept.map(e => listParquet(Paths.get(root, e.dir)).size).sum, 0L)
    val unclFiles = uncl.flatMap(e => listParquet(Paths.get(root, e.dir)))
    val bytes = unclFiles.map(Files.size).sum
    val targetFiles = math.max(1,
      math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // read the unclustered dirs through their deletion vectors (dead rows
    // materialize away — the targeted REORG, same as optimizeCompact)
    val scan0 = spark.read.schema(physSchema(m))
      .parquet(uncl.map(e => s"$root/${e.dir}"): _*)
    val batch = antiJoinDeleteVectors(toLogicalNames(m,
        if (m.deleteVectors.isEmpty) scan0 else rowIdCols(scan0)), m)
      .select(m.schema.fieldNames.map(col).toSeq: _*)
    val (clustered, release) =
      if (zOrderable(cols)) zorderClustered(batch, m, cols, targetFiles)
      else (batch.repartitionByRange(targetFiles, cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*), () => ())
    try {
      val (dir, _, fstats) = writeData(clustered, None, m.statsCols,
        preclustered = true, bloomCols = m.bloomCols, colMap = m.colMap)
      val keptDirs = kept.map(_.dir).toSet
      val keptStats =
        m.fileStats.filter(fs => keptDirs.exists(d => fs.path.startsWith(d + "/")))
      // DRAIN stale deletion vectors: the rewritten dirs' dead rows just
      // materialized away, so any DV dir whose coordinates all address
      // rewritten (now-unreferenced) files is dead weight — on a clustered
      // table maintain() always takes this branch, so without pruning the
      // DV list would grow forever and every read would pay the DV scan +
      // anti-join with zero live vectors. Keep only dirs that still address
      // a KEPT file. One metadata-sized job: rows per DV dir = its deleted
      // row count; the collect is DV-dir-count-sized.
      val keptDvs =
        if (m.deleteVectors.isEmpty || kept.isEmpty) Nil
        else {
          val prefix = "file:" +
            Paths.get(root).toAbsolutePath.normalize.toString + "/"
          val dv = spark.read.schema(DvSchema)
            .parquet(m.deleteVectors.map(d => s"$root/$d"): _*)
            .select(
              // DV dirs are `_dv/<uuid>` (two segments) — recover each
              // row's owning dir from its file's root-relative path
              expr(s"substring_index(substring(_metadata.file_path, " +
                s"${prefix.length + 1}), '/', 2)").as("dvdir"),
              col("file"))
          val underKept = keptDirs.toSeq.sorted
            .map(d => col("file").startsWith(d + "/"))
            .reduce(_ || _)
          val liveDirs = dv.filter(underKept)
            .select("dvdir").distinct()
            .collect().map(_.getString(0)).toSet
          m.deleteVectors.filter(liveDirs)
        }
      if (!tryCommit(Manifest(m.schema, m.pcol,
          kept :+ DirEntry(dir, None, clustered = true), "optimize",
          m.cdfEnabled, None, m.statsCols, keptStats ++ fstats,
          txns = m.txns, droppedCols = m.droppedCols,
          constraints = m.constraints, generated = m.generated,
          deleteVectors = keptDvs, bloomCols = m.bloomCols,
          colMap = m.colMap, props = m.props, clusterKey = cols), v0 + 1))
        throw new ConcurrentWriteException(
          s"optimize computed against version $v0 of $root, but a concurrent " +
            s"writer committed v${v0 + 1} first — recompute and retry")
      OptimizeStats(listParquet(Paths.get(root, dir)).size,
        kept.map(e => listParquet(Paths.get(root, e.dir)).size).sum, bytes)
    } finally release()
  }

  /** Whether every column in `cols` carries a z-orderable type
   *  (numeric/timestamp/date) — decides [[compactZOrder]] vs
   *  [[compactSort]] for liquid-clustered OPTIMIZE. */
  def zOrderable(cols: Seq[String]): Boolean = {
    val s = schema
    cols.forall { c =>
      s.fieldNames.contains(c) && (s(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.DateType => true
        case _ => false
      })
    }
  }

  /** The Z-order clustering transform shared by [[compactZOrder]] (whole
   *  table) and [[optimizeWhere]] (partition-scoped): quantize each z-col
   *  to equi-depth 8-bit bins, interleave the bin bits into a z-value, and
   *  range-repartition + sort so each output file covers a contiguous span
   *  of the curve. Returns the clustered frame and an unpersist handle the
   *  caller releases after consuming it (the quantile sketch and the write
   *  are two passes over the input). */
  private def zorderClustered(df: DataFrame, m: Manifest, zcols: Seq[String],
      targetFiles: Int): (DataFrame, () => Unit) = {
    require(zcols.nonEmpty && zcols.size <= 4, "1..4 z-order columns")
    zcols.foreach { c =>
      require(m.schema.fieldNames.contains(c), s"unknown z-order column $c")
      require(!m.pcol.contains(c), s"$c is the partition column — the Hive " +
        "layout already clusters it; z-order the within-partition columns")
      val dt = m.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.DateType,
        s"z-order column $c has unsupported type $dt")
    }
    // one numeric shadow column per z-col for the quantile sketch
    val shadowed = zcols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__zc$i", col(c).cast("double"))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bits = 8
    val bins = 1 << bits
    val probes = (1 until bins).map(_.toDouble / bins).toArray
    // bin = #boundaries <= value (0..255); null sorts to bin 0
    def binOf(bnds: Column, i: Int): Column =
      coalesce(size(filter(bnds, b => b <= coalesce(col(s"__zc$i"),
        lit(Double.NegativeInfinity)))), lit(0))
    // interleave: bit b of column i lands at position b*k + i
    def interleave(binCols: Seq[Column]): Column = {
      val k = binCols.size
      (0 until bits).flatMap { b =>
        binCols.zipWithIndex.map { case (bc, i) =>
          shiftleft(shiftright(bc, b).bitwiseAND(lit(1)), b * k + i)
        }
      }.reduce[Column](_ bitwiseOR _)
    }
    val zdrop = zcols.indices.map(i => s"__zc$i") :+ "__z"
    val clustered = m.pcol match {
      case None =>
        val binCols = zcols.indices.map { i =>
          val bnds = shadowed.stat
            .approxQuantile(s"__zc$i", probes, 0.01).distinct.sorted
          if (bnds.isEmpty) lit(0): Column
          else binOf(array(bnds.map(lit(_)): _*), i)
        }
        shadowed.withColumn("__z", interleave(binCols))
          .repartitionByRange(targetFiles, col("__z"))
          .sortWithinPartitions("__z")
          .drop(zdrop: _*)
      case Some(p) =>
        // equi-depth boundaries PER PARTITION, one grouped aggregation
        // pass (never a per-partition driver loop); boundary arrays ride
        // a broadcast join back onto the rows
        val probeArr = array(probes.map(lit(_)): _*)
        val aggs = zcols.indices.map(i =>
          percentile_approx(col(s"__zc$i"), probeArr, lit(10000))
            .as(s"__bnds$i"))
        val bnds = shadowed.groupBy(col(p)).agg(aggs.head, aggs.tail: _*)
        val cleaned = zcols.indices.foldLeft(bnds)((d, i) =>
          d.withColumn(s"__bnds$i",
            array_sort(array_distinct(col(s"__bnds$i")))))
        val binCols = zcols.indices.map(i => binOf(col(s"__bnds$i"), i))
        shadowed.join(broadcast(cleaned), Seq(p))
          .withColumn("__z", interleave(binCols))
          .repartitionByRange(targetFiles, col(p), col("__z"))
          .sortWithinPartitions(col(p), col("__z"))
          .drop(zcols.indices.map(i => s"__bnds$i") ++ zdrop: _*)
          .select(m.schema.fieldNames.map(col).toSeq: _*)
    }
    (clustered, () => { shadowed.unpersist(); () })
  }

  /**
   * PARTITION-SCOPED OPTIMIZE (Delta `OPTIMIZE t WHERE <partition pred>
   * [ZORDER BY (...)]`): rewrite ONLY the partitions matching `preds` —
   * bin-packed, or Z-order clustered when `zcols` is non-empty — and leave
   * every other partition's files byte-for-byte untouched: the commit
   * transfers ownership of the matching partition values to the freshly
   * written dir and keeps the remaining entries exactly as they were, so
   * untouched files keep their paths AND inodes (no relink, no copy).
   * This is how table maintenance survives 100 TB: the nightly OPTIMIZE
   * touches yesterday's partition, not the table — cost is O(matched
   * partitions), independent of table size, where [[compactZOrder]] /
   * [[optimizeCompact]] are O(table) per invocation.
   *
   * `preds` must name only the partition column (Delta's rule: only
   * partition predicates can scope whole-file maintenance); values are
   * matched against the manifest's owned partition values — no data scan
   * decides the scope. Deletion vectors over the scoped partitions are
   * materialized by the rewrite; vectors over untouched partitions stay
   * live (their coordinates still address the untouched files, and stale
   * coordinates into rewritten partitions can never match a scanned row).
   * Returns files rewritten (new files), files kept untouched, and bytes
   * of scoped input rewritten.
   */
  def optimizeWhere(preds: Seq[ZonePred], zcols: Seq[String] = Nil,
      targetFiles: Int = 16): OptimizeStats = synchronized {
    require(exists, s"LakeTable at $root does not exist")
    val v0 = currentVersion
    val m = readManifest(v0)
    val p = m.pcol.getOrElse(throw new IllegalArgumentException(
      "OPTIMIZE ... WHERE needs a partitioned table — use optimizeCompact()/" +
        "compactZOrder() for whole-table maintenance"))
    require(preds.nonEmpty,
      "OPTIMIZE ... WHERE with no predicate — use optimizeCompact()/compactZOrder()")
    preds.foreach(pr => require(pr.col == p,
      s"OPTIMIZE WHERE must predicate only the partition column $p, " +
        s"got ${pr.col} (Delta's rule — only partition predicates scope files)"))
    val numeric =
      m.schema(p).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    def cmp(a: String, b: String): Int =
      if (!numeric) a.compareTo(b)
      else try BigDecimal(a).compare(BigDecimal(b))
      catch { case _: NumberFormatException => 0 }
    def inScope(v: String): Boolean = preds.forall(pr =>
      pr.lo.forall(l => cmp(v, l) >= 0) && pr.hi.forall(h => cmp(v, h) <= 0))
    val scope = m.entries.flatMap(_.owned.getOrElse(Nil)).distinct.filter(inScope)
    val (scopedFiles, scopedBytes, keptFiles) = {
      var sf = 0; var sb = 0L; var kf = 0
      m.entries.foreach { e =>
        val owned = e.owned.getOrElse(Nil).toSet
        listParquet(Paths.get(root, e.dir)).foreach { f =>
          val sub = Paths.get(root, e.dir).relativize(f).toString
          val v = partitionValueOf(sub, physName(m, p))
          if (v.exists(x => owned(x) && inScope(x))) { sf += 1; sb += Files.size(f) }
          else if (v.exists(owned)) kf += 1 // live, out of scope: untouched
          // else: a partition this dir no longer owns — dead, vacuum's business
        }
      }
      (sf, sb, kf)
    }
    if (scope.isEmpty) return OptimizeStats(0, keptFiles, 0L)
    val scopeSet = scope.toSet
    // scoped snapshot rows, deletion vectors applied (the rewrite
    // materializes deletes for these partitions)
    val df0 = readScoped(m, Some(scopeSet))
    val (df, release) =
      if (zcols.isEmpty) (df0.repartition(col(p)), () => ())
      else zorderClustered(df0, m, zcols, targetFiles)
    val (dir, owned, fstats) =
      try writeData(df, m.pcol, m.statsCols, preclustered = true,
        bloomCols = m.bloomCols, colMap = m.colMap)
      finally release()
    val keptEntries = m.entries.flatMap { e =>
      val rest = e.owned.map(_.filterNot(scopeSet))
      if (rest.exists(_.isEmpty)) None else Some(e.copy(owned = rest))
    }
    val keptDirs = keptEntries.map(_.dir).toSet
    val keptStats =
      m.fileStats.filter(fs => keptDirs.exists(d => fs.path.startsWith(d + "/")))
    if (!tryCommit(Manifest(m.schema, m.pcol, keptEntries :+ DirEntry(dir, owned),
        "optimize", m.cdfEnabled, None, m.statsCols, keptStats ++ fstats,
        txns = m.txns, droppedCols = m.droppedCols,
        constraints = m.constraints, generated = m.generated,
        deleteVectors = m.deleteVectors, bloomCols = m.bloomCols,
        colMap = m.colMap, props = m.props,
        clusterKey = m.clusterKey), v0 + 1))
      throw new ConcurrentWriteException(
        s"optimize computed against version $v0 of $root, but a concurrent " +
          s"writer committed v${v0 + 1} first — recompute and retry")
    OptimizeStats(listParquet(Paths.get(root, dir)).size, keptFiles, scopedBytes)
  }
}

object LakeTable {
  private val T_MARK = "__t_exists"
  private val S_MARK = "__s_exists"
  private[lake] final class MicrosState {
    var depth: Int = 0
    var prev: Option[String] = None
  }
  private[lake] val microsOverride =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, MicrosState]()
  /** Sentinel cdfDir value: the commit's ADDED DATA dirs are its insert
   *  images (all-insert commits — bootstrap merges). Never a real path. */
  private[lake] val CdfFromData = "__cdf_from_data__"
  /** Diagnostic: how often footer-based zone stats fell back to the Spark
   *  aggregation pass (expected ~never — parity specs assert it stays 0). */
  private[lake] val footerStatsFallbacks = new java.util.concurrent.atomic.AtomicLong()
  /** [[LakeTable.vacuumRetainHours]] safety floor (Delta's default retention
   *  window): reclaiming data younger than this risks failing a reader that
   *  resolved its snapshot before the vacuum started. */
  val MinRetentionHours: Double = 168.0
  /** Full-checkpoint cadence of the manifest log (Delta's
   *  `delta.checkpointInterval` default): commits between checkpoints are
   *  diff-encoded against their parent, so per-commit manifest bytes scale
   *  with the files TOUCHED, not the table; snapshot resolution reads at
   *  most one checkpoint + this-many-minus-one deltas. */
  val ManifestCheckpointInterval: Int = 10
  /** The recognized TBLPROPERTIES key that switches change-data capture
   *  (Delta's `delta.enableChangeDataFeed` role). */
  val ChangeFeedProp = "enableChangeFeed"

  /** Table property carrying the liquid-clustering columns (Delta's
   *  `clusteringColumns` metadata, set via SQL `CLUSTER BY`). */
  val ClusterByProp = "clusteringColumns"

  /** Table-property prefix for column DEFAULT values (`CREATE TABLE …
   *  (c INT DEFAULT <expr>)`): `default.<col>` holds the expression SQL.
   *  Applied when a named-column INSERT omits the column. */
  val DefaultPropPrefix = "default."

  /** Table-property prefix for IDENTITY columns (Delta `GENERATED ALWAYS
   *  AS IDENTITY`): `identity.<col>` holds "start,step", and
   *  `identity.<col>.hw` the last assigned value — committed atomically
   *  with each append, so the sequence survives restarts, restore, and
   *  clone like any other manifest state. */
  val IdentityPropPrefix = "identity."
  /** TBLPROPERTIES keys driving write-side AUTO COMPACT (Delta
   *  `delta.autoOptimize.autoCompact` role): switch, small-file count
   *  threshold, and target packed-file size. MUTUALLY EXCLUSIVE with
   *  file-glob `readStream` on the same table: auto-compact makes appends
   *  commit optimize rewrites, which an append-only file stream refuses
   *  (rewritten files would replay as duplicates) — its error names this
   *  property when that's the cause. Stream a non-compacting bronze table
   *  and OPTIMIZE downstream instead. */
  val AutoCompactProp = "autoCompact"
  val AutoCompactMinFilesProp = "autoCompact.minFiles"
  val AutoCompactTargetBytesProp = "autoCompact.targetFileBytes"
  /** TYPE WIDENING (Delta `delta.enableTypeWidening`): with this property
   *  `'true'`, a type change along [[widensTo]]'s lossless lattice is a
   *  METADATA-ONLY schema change — no data file rewritten at any table
   *  size. Old narrow files are served through Spark 4's parquet widening
   *  promotion (the reader upcasts int32 under a BIGINT schema, float
   *  under DOUBLE, …); pre-widen files stay physically narrow while
   *  narrower post-widen batches are cast up at write (their zone stats
   *  must carry the column's real type). Applies to `append`
   *  evolution and `ALTER TABLE … ALTER COLUMN … TYPE`; MERGE evolution
   *  keeps the loud equality contract (its clause expressions bind both
   *  sides). */
  val TypeWideningProp = "delta.enableTypeWidening"

  /** The supported LOSSLESS widening lattice (Delta's, minus the
   *  date→timestampNTZ row): integral upcasts, float→double, sub-long
   *  integral→double (every int32 is exact in a double; long→double is
   *  lossy and refused), integral→DECIMAL(p,0) with enough integer
   *  digits, and decimal→decimal where the scale only grows and the
   *  integer-part capacity (p−s) never shrinks — all value-exact. Each
   *  pair class is reader-proven in `TypeWideningSpec` — a pair outside
   *  the proven set must never be added without a mixed-era read test. */
  private[lake] def widensTo(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case (ByteType, d: DecimalType) => d.scale == 0 && d.precision >= 3
      case (ShortType, d: DecimalType) => d.scale == 0 && d.precision >= 5
      case (IntegerType, d: DecimalType) => d.scale == 0 && d.precision >= 10
      case (LongType, d: DecimalType) => d.scale == 0 && d.precision >= 20
      case (a: DecimalType, b: DecimalType) =>
        b.scale >= a.scale &&
          b.precision - b.scale >= a.precision - a.scale &&
          (b.precision > a.precision || b.scale > a.scale)
      case _ => false
    }
  }
  /** Change-feed column names (Delta CDF's). */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitTimestampCol = "_commit_timestamp"
  /** Deletion-vector row coordinates attached to scans (internal). */
  private val DvFileCol = "__dv_file"
  private val DvPosCol = "__dv_pos"
  /** Bloom index sizing: per-file expected distinct values and target false
   *  positive rate. 50k items @ 1% ≈ 60 KB/file/column — a production
   *  deployment writing ~1M-row files would size these from write stats;
   *  the knob is a constant here because the CONTRACT (absent/undersized
   *  blooms only lose pruning, never correctness) does not depend on it. */
  private val BloomExpectedItems = 50000L

  /** Row cap for the driver-local LocalRelation write path: above this a
   *  distributed write amortizes its scheduling cost; below it the Spark
   *  job IS the cost. LocalRelations are driver memory by definition, so
   *  the cap bounds single-file size, not correctness. */
  private[lake] val LocalWriteMaxRows = 100000

  /** Minimum table bytes before a merge attempts file pruning — below it
   *  the bounds aggregation + relink bookkeeping cost more than the full
   *  rewrite they avoid. Scale-derived (data size), deliberately NOT a
   *  core-count constant; override per session for tests or small-file
   *  deployments. */
  private[lake] def mergePruneMinBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.merge.pruneMinBytes")
      .map(_.toLong).getOrElse(64L * 1024 * 1024)
  private val BloomFpp = 0.01

  /** Executor-side OR-merge of two serialized per-file bloom arrays (one
   *  element per indexed column) — the reduceByKey combiner of the index
   *  build. Lives on the companion so the task closure captures no table. */
  private[lake] def mergeBloomBytes(a: Array[Array[Byte]],
      b: Array[Array[Byte]]): Array[Array[Byte]] = {
    require(a.length == b.length,
      s"bloom partial arity mismatch: ${a.length} vs ${b.length}")
    a.zip(b).map { case (x, y) =>
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(x))
      bf.mergeInPlace(org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(y)))
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
  }
  /** Deletion-vector parquet schema: root-relative data file + row index. */
  private val DvSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** One data directory of a snapshot. `owned` scopes partitioned dirs to
   *  the partition values this entry still owns; `clustered` marks dirs
   *  whose files were WRITTEN BY a clustering pass on the manifest's
   *  [[Manifest.clusterKey]] — incremental `OPTIMIZE` on a liquid-clustered
   *  table rewrites only the unflagged dirs (Delta's incremental
   *  clustering). The flag rides the entry wherever entries are carried,
   *  so appends/merges/DML never have to know about it; any rewrite that
   *  produces a fresh entry defaults to unclustered, which can only cost a
   *  re-cluster, never correctness. */
  private case class DirEntry(dir: String, owned: Option[Seq[String]],
      clustered: Boolean = false)
  /** Zone map for one data file: root-relative path → per-column (min, max)
   *  as Spark CAST-to-STRING renderings (UTC session). Columns whose min or
   *  max is NULL in the file are absent — absent stats never prune. */
  private case class FileStat(path: String, minMax: Map[String, (String, String)])
  private case class Manifest(schema: StructType, pcol: Option[String],
      entries: Seq[DirEntry], op: String,
      cdfEnabled: Boolean = false, cdfDir: Option[String] = None,
      statsCols: Seq[String] = Nil, fileStats: Seq[FileStat] = Nil,
      /** Commit wall-clock (epoch ms), stamped at publish time by
       *  [[LakeTable.tryCommit]] — never set by manifest constructors.
       *  None for manifests written before the field existed. */
      commitTsMs: Option[Long] = None,
      /** CHECK constraints (name → SQL boolean expr), enforced on every
       *  incoming batch. Name-ordered for deterministic manifests. */
      constraints: Seq[(String, String)] = Nil,
      /** GENERATED columns (col → SQL expr): computed when a batch omits
       *  them, validated when it supplies them. Fixed at create time. */
      generated: Seq[(String, String)] = Nil,
      /** DELETION VECTORS (merge-on-read DELETE): root-relative dirs of
       *  parquet (file STRING root-relative, pos BIGINT row index) naming
       *  rows that are logically deleted. Reads anti-join them out; data
       *  files are NEVER rewritten by the delete. Entries referencing files
       *  no longer in `entries` are stale and harmless (the anti-join
       *  cannot match). Full-rewrite commits (overwrite/compact/merge-all)
       *  read through the vectors and clear them. */
      deleteVectors: Seq[String] = Nil,
      /** BLOOM-FILTER INDEX columns (Delta bloom filter index): per-file
       *  blooms built at write time into `_bloom/<dir-uuid>.idx` sidecars;
       *  equality predicates on these columns prune files zone maps cannot
       *  (high-cardinality, unclustered keys). Missing sidecars (pre-index
       *  dirs, hard-link relinks) simply never prune. */
      bloomCols: Seq[String] = Nil,
      /** TRANSACTION LEDGER (Delta `txnAppId`/`txnVersion` idempotent
       *  writes): highest committed application version per writer id.
       *  [[LakeTable.appendIdempotent]] consults it to make retried job
       *  writes exactly-once. Carried verbatim across every commit kind. */
      txns: Seq[(String, Long)] = Nil,
      /** TOMBSTONES of metadata-only [[LakeTable.dropColumn]]s: old data
       *  files still physically carry these columns (under their PHYSICAL
       *  names), so re-adding one via schema evolution would RESURRECT
       *  stale values — evolution rejects tombstoned names. Cleared by full
       *  rewrites (overwrite/compact), which physically shed the dropped
       *  bytes. */
      droppedCols: Seq[String] = Nil,
      /** COLUMN MAPPING (Delta `columnMapping.mode = name`): logical →
       *  physical name, recorded only where they differ. A column's
       *  physical name is fixed at creation; [[LakeTable.renameColumn]]
       *  changes ONLY the logical name — no data file is ever rewritten.
       *  The manifest schema, partition column, stats/bloom registrations,
       *  constraints and generated expressions all live in LOGICAL space;
       *  translation happens exactly at the parquet read/write boundary
       *  (and in per-file stats/bloom/partition-dir naming, which describe
       *  physical files and therefore stay keyed physical forever). */
      colMap: Seq[(String, String)] = Nil,
      /** TBLPROPERTIES (Delta table properties): free-form key → value,
       *  name-ordered for deterministic manifests. `enableChangeFeed` is
       *  recognized and routed to [[Manifest.cdfEnabled]] rather than
       *  stored here. */
      props: Seq[(String, String)] = Nil,
      /** The clustering key the entry-level `clustered` flags refer to
       *  (set by clustering rewrites). When the DECLARED key (the
       *  [[LakeTable.ClusterByProp]] property) differs — e.g. after
       *  `ALTER TABLE … CLUSTER BY` changed it — the flags are simply
       *  ignored and the next OPTIMIZE re-clusters everything on the new
       *  key. O(1) metadata; a constructor that forgets to carry it only
       *  costs one extra full re-cluster. */
      clusterKey: Seq[String] = Nil)

  /** DESCRIBE DETAIL row (Delta parity): current-snapshot facts. */
  final case class TableDetail(
      location: String, version: Long, numFiles: Long, sizeInBytes: Long,
      partitionColumns: Seq[String], statsColumns: Seq[String],
      changeFeedEnabled: Boolean, constraints: Map[String, String],
      generatedColumns: Map[String, String],
      lastOperation: String, lastCommitTimestampMs: Option[Long],
      /** Live deletion-vector dirs (rows logically deleted, files intact). */
      deletionVectors: Int = 0,
      /** Bloom-indexed columns (point-lookup file skipping). */
      bloomFilterColumns: Seq[String] = Nil,
      /** Liquid-clustering key (empty = not clustered). */
      clusteringColumns: Seq[String] = Nil)

  /** Conjunctive data-skipping predicate: `col` between `lo` and `hi`, both
   *  inclusive, either bound open. Bound values are Spark CAST-to-STRING
   *  renderings of the column's type (timestamps as
   *  `yyyy-MM-dd HH:mm:ss[.S]`, UTC). */
  final case class ZonePred(col: String, lo: Option[String], hi: Option[String])
  object ZonePred {
    def eq(col: String, v: String): ZonePred = ZonePred(col, Some(v), Some(v))
    def atLeast(col: String, v: String): ZonePred = ZonePred(col, Some(v), None)
    def atMost(col: String, v: String): ZonePred = ZonePred(col, None, Some(v))
    def between(col: String, lo: String, hi: String): ZonePred =
      ZonePred(col, Some(lo), Some(hi))
  }

  def apply(spark: SparkSession, root: String): LakeTable =
    new LakeTable(spark, root, () => System.currentTimeMillis())

  /** Injectable commit clock (epoch millis) — tests and oracle-compared
   *  queries pin it so `_commit_timestamp` is reproducible. */
  def withClock(spark: SparkSession, root: String, clock: () => Long): LakeTable =
    new LakeTable(spark, root, clock)

  /** Hive-layout `%XX` unescape. Consecutive escapes accumulate into one
   *  byte run that is UTF-8-decoded TOGETHER (so `%C3%A9` → `é`, never two
   *  mojibake chars), and a `%` not followed by two hex digits passes
   *  through literally — both matching Hive/Spark `unescapePathName`. */
  private[lake] def unescapePathName(s: String): String = {
    def isHex(c: Char): Boolean = Character.digit(c, 16) >= 0
    val sb = new StringBuilder
    val run = new java.io.ByteArrayOutputStream(8)
    def flush(): Unit = if (run.size() > 0) {
      sb.append(new String(run.toByteArray, StandardCharsets.UTF_8))
      run.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) &&
          isHex(s.charAt(i + 2))) {
        run.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { flush(); sb.append(c); i += 1 }
    }
    flush()
    sb.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toList.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  private def listParquet(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) Nil
    else Files.list(dir).iterator().asScala.toList.flatMap { p =>
      if (Files.isDirectory(p)) listParquet(p)
      else if (p.getFileName.toString.endsWith(".parquet")) Seq(p)
      else Nil
    }
  }
}
