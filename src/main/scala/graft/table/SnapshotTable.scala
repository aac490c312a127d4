package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style snapshot layer over Parquet (no Iceberg runtime offline —
  * SURVEY.md §0): append-only snapshots, manifest JSON per snapshot, an
  * atomically-replaced CURRENT pointer, idempotent resume, and orphan GC.
  *
  * Layout:
  * {{{
  *   <root>/data/snap-<id>/part-*.parquet     one dir per snapshot's appends
  *   <root>/manifests/snap-<id>.json          manifest (id, parent, files, meta)
  *   <root>/CURRENT                           latest committed snapshot id
  * }}}
  *
  * Commit protocol (analog of the reference's Redis result store becoming
  * queryable only when the RQ job completes, docsbox/docs/tasks.py:16-18):
  * data files are invisible until the manifest is moved into place and
  * CURRENT is atomically replaced; a crash mid-write leaves only orphan data
  * dirs, which `sweepOrphans` collects (TTL cleaner analog,
  * docsbox/cleaner/__init__.py:10-37).
  */
final class SnapshotTable(val root: String) {

  /** Directory listing with the stream CLOSED (Files.list leaks the
    * directory fd until the stream is closed — driver-side, bounded, but a
    * long-lived driver sweeping many tables would accumulate them). */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def dataDir(id: Long): Path = Paths.get(root, "data", s"snap-$id")
  private def manifestPath(id: Long): Path = Paths.get(root, "manifests", s"snap-$id.json")
  private def currentPath: Path = Paths.get(root, "CURRENT")

  def currentSnapshotId: Option[Long] =
    if (Files.exists(currentPath))
      Some(new String(Files.readAllBytes(currentPath), StandardCharsets.UTF_8).trim.toLong)
    else None

  case class Manifest(id: Long, parentId: Long, files: Seq[String],
      rowCount: Long, meta: Map[String, String])

  private def writeManifest(m: Manifest): Unit = {
    Files.createDirectories(manifestPath(m.id).getParent)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val metaJson = m.meta.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    val json =
      s"""{"id": ${m.id}, "parentId": ${m.parentId}, "rowCount": ${m.rowCount},
         | "files": [${m.files.sorted.map(q).mkString(", ")}],
         | "meta": $metaJson}""".stripMargin
    val tmp = manifestPath(m.id).resolveSibling(s".tmp-snap-${m.id}.json")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(m.id), StandardCopyOption.ATOMIC_MOVE)
  }

  def readManifest(id: Long): Manifest = {
    val json = new String(Files.readAllBytes(manifestPath(id)), StandardCharsets.UTF_8)
    def longField(name: String): Long = {
      val m = ("\"" + name + "\":\\s*(-?\\d+)").r.findFirstMatchIn(json)
      m.map(_.group(1).toLong).getOrElse(-1L)
    }
    val files = "\"files\":\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    val meta = "\"meta\":\\s*\\{([^}]*)\\}".r.findFirstMatchIn(json)
      .map(_.group(1)).map { body =>
        "\"([^\"]+)\":\\s*\"([^\"]*)\"".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2)).toMap
      }.getOrElse(Map.empty[String, String])
    Manifest(longField("id"), longField("parentId"), files, longField("rowCount"), meta)
  }

  /** Guard against appending a snapshot whose schema-affecting meta value
    * differs from the chain's (e.g. a text-only commit onto a full-rows
    * table — the union read would fail on mixed schemas). A non-empty chain
    * whose manifest predates the key is treated as `defaultForMissing`
    * (when given) rather than skipped — otherwise a pre-upgrade chain would
    * accept exactly the mixed-schema append the guard exists to prevent. */
  def requireMetaConsistent(key: String, value: String,
      defaultForMissing: String = null): Unit =
    currentSnapshotId.foreach { cur =>
      readManifest(cur).meta.get(key)
        .orElse(Option(defaultForMissing))
        .foreach { prev =>
          require(prev == value,
            s"table at $root has $key=$prev; refusing to append $key=$value " +
              "(mixed snapshot schemas would break reads)")
        }
    }

  /** Chain of snapshot ids from CURRENT back to the first. */
  def snapshotChain: Seq[Long] = currentSnapshotId match {
    case None => Nil
    case Some(cur) =>
      val ids = Seq.newBuilder[Long]
      var id = cur
      while (id >= 0) {
        ids += id
        id = readManifest(id).parentId
      }
      ids.result()
  }

  /** Shared commit core: write `df` under snap-`id`, then manifest, then
    * the atomic CURRENT swap — data is invisible until the swap; a crash
    * at ANY point leaves the previous CURRENT fully readable (the debris
    * is an orphan data dir / unreferenced manifest for the cleaner).
    * `meta` is BY-NAME, evaluated AFTER the data write: lineage values
    * observed during the write (per-stage curate counts) are complete by
    * then. The manifest row count is captured DURING the write via
    * `observe` — no re-read of the freshly-written output (a full extra
    * scan at 100 TB). */
  private def writeAndSwap(df: DataFrame, id: Long, parentId: Long,
      meta: => Map[String, String]): Long = {
    val dir = dataDir(id)
    val obs = org.apache.spark.sql.Observation(s"graft-commit-$id")
    df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("overwrite").parquet(dir.toString)
    val files = listDir(dir)
      .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
    val rows = obs.get("rows").asInstanceOf[Long]
    writeManifest(Manifest(id, parentId, files, rows, meta))
    val tmp = Paths.get(root, ".CURRENT.tmp")
    Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    id
  }

  /** Append `df` as a new snapshot; returns the committed snapshot id.
    * Visible only after the atomic CURRENT replace. */
  def commit(df: DataFrame, meta: => Map[String, String] = Map.empty): Long = {
    val parent = currentSnapshotId.getOrElse(-1L)
    writeAndSwap(df, parent + 1, parent, meta)
  }

  /** Commit `df` as a REPLACEMENT: the new snapshot becomes a fresh base
    * (no parent) and the previous chain's manifests + data are swept AFTER
    * the atomic CURRENT swap. For re-derived product tables — the curated
    * output, where each job recomputes the WHOLE table rather than
    * appending an increment (appending would union stale rows into every
    * read). Same crash guarantee as [[commit]]: until the swap, readers
    * see the previous table; a kill mid-write leaves orphans, never a
    * half-replaced table. */
  def commitReplace(df: DataFrame, meta: => Map[String, String] = Map.empty): Long = {
    val oldChain = snapshotChain
    val id = oldChain.headOption.getOrElse(-1L) + 1
    writeAndSwap(df, id, -1L, meta)
    oldChain.foreach(old => Files.deleteIfExists(manifestPath(old)))
    sweepOrphans()
    id
  }

  /** Read the table as of CURRENT (union of the snapshot chain's data dirs).
    * Empty (schema-less) if nothing is committed — callers guard. */
  def read(spark: SparkSession): Option[DataFrame] = {
    val dirs = snapshotChain.map(dataDir(_).toString)
      .filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*))
  }

  /** Compact the snapshot chain: rewrite the table as-of CURRENT into one
    * fresh base snapshot, point CURRENT at it, and sweep the old chain's
    * data+manifests. This is the retention/expiry maintenance action (the
    * reference's TTL cleaner analog, docsbox/cleaner/__init__.py:10-37,
    * RESULT_FILE_TTL config.yml:8): history older than the compacted base
    * is gone; readers always see a consistent CURRENT (the swap is the
    * same atomic rename as a commit). Returns the new snapshot id. */
  def compact(spark: SparkSession, meta: Map[String, String] = Map.empty): Long = {
    val current = read(spark).getOrElse(
      throw new IllegalStateException("nothing committed; cannot compact"))
    commitReplace(current, meta) // rewrite-as-of-CURRENT is a replacement
  }

  /** Delete data dirs not referenced by any manifest in the CURRENT chain —
    * debris of crashed commits (cleaner analog). Returns dirs removed. */
  def sweepOrphans(): Seq[String] = {
    val dataRoot = Paths.get(root, "data")
    if (!Files.exists(dataRoot)) return Nil
    val live = snapshotChain.map(id => s"snap-$id").toSet
    val removed = Seq.newBuilder[String]
    listDir(dataRoot).foreach { p =>
      val name = p.getFileName.toString
      if (!live.contains(name)) {
        deleteRecursively(p)
        removed += name
      }
    }
    removed.result()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
