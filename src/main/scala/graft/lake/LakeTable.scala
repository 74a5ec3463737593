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
 *     _commits/v000000001.mf   // manifest: schema (base64 JSON) + data dir list
 *     data/<uuid>/part-*.parquet
 * }}}
 *
 * Commit = write data files to a fresh `data/<uuid>` dir, write the next
 * manifest, then atomically replace `_VERSION`. Readers resolve `_VERSION` →
 * manifest → file list, so they always see a consistent snapshot (old
 * versions' files are retained until `vacuum`). Single-writer per process is
 * assumed (the harness is one JVM); a real deployment would swap the pointer
 * file for a log-append with conditional-put, exactly as Delta's commit
 * protocol does.
 *
 * Scale design (100 TB): `append` is O(new data) — it never rewrites
 * existing files, so streaming ingest cost is independent of table size.
 * `merge` is join-based (shuffle on the merge keys, broadcast when the
 * source is small — left to AQE) and rewrites only on commit; at cluster
 * scale the upgrade path is hive-style partitioning + rewriting only the
 * partitions whose keys appear in the source (dynamic partition overwrite),
 * which this manifest layout supports without format changes.
 */
final class LakeTable private (val spark: SparkSession, val root: String) {
  import LakeTable._

  private def versionFile: Path = Paths.get(root, "_VERSION")
  private def commitsDir: Path = Paths.get(root, "_commits")
  private def manifestFile(v: Long): Path = commitsDir.resolve(f"v$v%09d.mf")

  def exists: Boolean = Files.exists(versionFile)

  def currentVersion: Long = {
    require(exists, s"LakeTable at $root does not exist")
    new String(Files.readAllBytes(versionFile), StandardCharsets.UTF_8).trim.toLong
  }

  private def readManifest(v: Long): Manifest = {
    val lines = Files.readAllLines(manifestFile(v), StandardCharsets.UTF_8).asScala
    val schemaB64 = lines.collectFirst { case l if l.startsWith("schema=") => l.stripPrefix("schema=") }
      .getOrElse(sys.error(s"manifest v$v missing schema"))
    val schema = StructType.fromDDL(
      new String(Base64.getDecoder.decode(schemaB64), StandardCharsets.UTF_8))
    val dirs = lines.collect { case l if l.startsWith("dir=") => l.stripPrefix("dir=") }.toSeq
    Manifest(schema, dirs)
  }

  def schema: StructType = readManifest(currentVersion).schema

  /** Snapshot read of the current version (explicit schema: no inference drift,
   *  empty tables read fine). */
  def read: DataFrame = {
    val m = readManifest(currentVersion)
    if (m.dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], m.schema)
    else
      spark.read.schema(m.schema).parquet(m.dirs.map(d => s"$root/$d"): _*)
  }

  private def commit(schema: StructType, dirs: Seq[String]): Unit = synchronized {
    val next = if (exists) currentVersion + 1 else 0L
    Files.createDirectories(commitsDir)
    val schemaB64 = Base64.getEncoder.encodeToString(schema.toDDL.getBytes(StandardCharsets.UTF_8))
    val body = (s"schema=$schemaB64" +: dirs.map(d => s"dir=$d")).mkString("\n")
    Files.write(manifestFile(next), body.getBytes(StandardCharsets.UTF_8))
    val tmp = Paths.get(root, s"_VERSION.tmp.${UUID.randomUUID()}")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create an empty table with the given schema (idempotent: no-op if it exists). */
  def create(schema: StructType): LakeTable = {
    if (!exists) { Files.createDirectories(Paths.get(root)); commit(schema, Nil) }
    this
  }

  private def writeData(df: DataFrame): String = {
    val dir = s"data/${UUID.randomUUID()}"
    df.write.parquet(s"$root/$dir")
    dir
  }

  /** Append-only write — O(new data), never rewrites existing files.
   *  This is the bronze-sink primitive (reference keeps bronze append-only,
   *  `README.md:89`). */
  def append(df: DataFrame): Unit = synchronized {
    Files.createDirectories(Paths.get(root))
    val dir = writeData(df)
    val prior = if (exists) readManifest(currentVersion).dirs else Nil
    commit(df.schema, prior :+ dir)
  }

  /** Full-snapshot replace (new version; old files kept until vacuum). */
  def overwrite(df: DataFrame): Unit = synchronized {
    Files.createDirectories(Paths.get(root))
    val dir = writeData(df)
    commit(df.schema, Seq(dir))
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
   * Plan shape: one shuffle on the merge keys (full-outer hash/sort-merge
   * join; AQE broadcasts a small source side as a broadcast outer join where
   * legal) followed by a projection — no driver-side iteration.
   */
  def merge(
      src: DataFrame,
      keys: Seq[String],
      matchedGuard: Option[String] = None,
      checkUniqueKeys: Boolean = false): Unit = synchronized {
    require(exists, s"merge target $root does not exist — create() or append() first")
    val target = read
    val cols = target.schema.fieldNames.toSeq
    require(src.columns.toSet == cols.toSet,
      s"merge source schema ${src.columns.mkString(",")} != target ${cols.mkString(",")}")
    if (checkUniqueKeys) {
      val dups = src.groupBy(keys.map(col): _*).count().filter(col("count") > 1).limit(1).count()
      require(dups == 0, s"merge source has duplicate keys $keys")
    }
    val t = target.withColumn(T_MARK, lit(true)).alias("t")
    val s = src.withColumn(S_MARK, lit(true)).alias("s")
    val joinCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val guard = matchedGuard.map(expr).getOrElse(lit(true))
    val takeSrc = col(S_MARK).isNotNull && (col(T_MARK).isNull || guard)
    val merged = t.join(s, joinCond, "full_outer")
      .select(cols.map(c => when(takeSrc, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)): _*)
    overwrite(merged)
  }

  /** Drop data dirs not referenced by the newest `keepVersions` manifests. */
  def vacuum(keepVersions: Int = 2): Unit = synchronized {
    if (!exists) return
    val cur = currentVersion
    val keep = (math.max(0L, cur - keepVersions + 1) to cur)
      .filter(v => Files.exists(manifestFile(v)))
      .flatMap(v => readManifest(v).dirs).toSet
    val dataRoot = Paths.get(root, "data")
    if (Files.isDirectory(dataRoot)) {
      Files.list(dataRoot).iterator().asScala.toList.foreach { p =>
        if (!keep.contains(s"data/${p.getFileName}")) deleteRecursively(p)
      }
    }
  }
}

object LakeTable {
  private val T_MARK = "__t_exists"
  private val S_MARK = "__s_exists"
  private case class Manifest(schema: StructType, dirs: Seq[String])

  def apply(spark: SparkSession, root: String): LakeTable = new LakeTable(spark, root)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toList.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
