package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal manifest-committed table format with snapshot isolation
  * and time travel — the metadata layer (Iceberg/Delta's essential
  * move) that q59's directory-swap COW cannot give: q59 rewrites a
  * partition IN PLACE, so the pre-upsert table is gone the moment
  * the rename lands. Here a commit never mutates or deletes a data
  * file; it writes NEW files plus a manifest (the ordered list of
  * data files that ARE version N), so every historical version stays
  * readable forever and a reader holding version N is immune to
  * concurrent commits (snapshot isolation by construction).
  *
  * Layout under `path`:
  *   files/<partCol>=<v>/c<N>-<uuid>.parquet   -- immutable data files
  *   manifests/v<N>.txt                        -- one relative path per line
  *
  * Scale stance (100 TB):
  *  - manifests are LAYOUT-sized (one line per data file), never
  *    data-sized — reading one is a driver-side metadata op, exactly
  *    what Iceberg's manifest lists are;
  *  - an upsert commit costs one partition read+write plus a
  *    manifest write: untouched partitions contribute their existing
  *    files to the new manifest BY REFERENCE (file sharing across
  *    versions — SnapshotSpec proves v1 ∩ v2 is every file outside
  *    the touched partition);
  *  - `readVersion` hands Spark the manifest's file list with
  *    `basePath` set, so partition-column recovery and partition
  *    pruning work exactly as on a directory listing, but against
  *    the COMMITTED file set (no eventual-consistency listing races
  *    — the object-store problem manifests exist to solve);
  *  - expiring old versions is just deleting manifests plus any file
  *    referenced by no surviving manifest (not implemented here —
  *    retention policy, not query semantics).
  *
  * Local-FS commit is a rename of the manifest into place (atomic on
  * POSIX); an object-store deployment would swap this single file
  * write for its conditional-put. */
object SnapshotTable {

  private def filesDir(path: String) = s"$path/files"
  private def manifestFile(path: String, v: Int) =
    Paths.get(s"$path/manifests/v$v.txt")

  /** Relative data-file paths making up version `v`. */
  def manifest(path: String, v: Int): Seq[String] =
    Files.readAllLines(manifestFile(path, v), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)

  /** Latest committed version (0 if none). */
  def currentVersion(path: String): Int = {
    val dir = new File(s"$path/manifests")
    if (!dir.isDirectory) 0
    else Option(dir.listFiles).toSeq.flatten
      .map(_.getName).collect { case s if s.startsWith("v") =>
        s.stripPrefix("v").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)
  }

  /** Stage `df` partitioned by `partCol`, then move its part-files
    * into the shared `files/` tree under commit-tagged names.
    * Returns the relative paths of the new files. */
  private def stageFiles(df: DataFrame, path: String, partCol: String,
      commit: Int): Seq[String] = {
    val stage = new File(s"$path/_stage_$commit")
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(stage.toString)
    val moved = FileFormats.listPartFiles(stage).map { f =>
      val partDir = f.getParentFile.getName // partCol=value
      val destDir = new File(s"${filesDir(path)}/$partDir")
      destDir.mkdirs()
      val name = s"c$commit-${f.getName.stripPrefix("part-")}"
      Files.move(f.toPath, new File(destDir, name).toPath,
        StandardCopyOption.ATOMIC_MOVE)
      s"$partDir/$name"
    }
    def rm(f: File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(stage)
    moved.sorted
  }

  private def commitManifest(path: String, v: Int, files: Seq[String]): Unit = {
    val target = manifestFile(path, v)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".v$v.tmp")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Initial commit: all of `df` becomes version 1. */
  def init(spark: SparkSession, df: DataFrame, path: String,
      partCol: String): Int = {
    require(currentVersion(path) == 0, s"$path already has commits")
    commitManifest(path, 1, stageFiles(df, path, partCol, 1))
    1
  }

  /** Upsert commit: rows of `delta` replace same-`keyCol` rows in the
    * partitions the delta touches; every other partition's files
    * carry over by reference. Returns the new version. */
  def upsertPartition(spark: SparkSession, path: String, delta: DataFrame,
      partCol: String, keyCol: String): Int = {
    val v = currentVersion(path)
    require(v > 0, s"$path has no initial commit")
    // layout-sized by design: partition values are the directory
    // fan-out (the cowUpsertByPartition argument)
    val affected = delta.select(col(partCol).cast("string")).distinct()
      .collect().map(r => s"$partCol=${r.getString(0)}").toSet
    val prev = manifest(path, v)
    val (replaced, kept) = prev.partition(f => affected(f.split("/").head))
    require(replaced.nonEmpty, "delta touches no existing partition")
    val base = readFiles(spark, path, replaced)
    val merged = base
      .join(delta.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(delta)
    val newFiles = stageFiles(merged, path, partCol, v + 1)
    commitManifest(path, v + 1, (kept ++ newFiles).sorted)
    v + 1
  }

  private def readFiles(spark: SparkSession, path: String,
      rel: Seq[String]): DataFrame =
    spark.read.option("basePath", filesDir(path))
      .parquet(rel.map(f => s"${filesDir(path)}/$f"): _*)

  /** Read table contents AS OF version `v` — time travel. Partition
    * columns are recovered from the file paths via `basePath`, so
    * partition pruning on `partCol` works against the manifest's
    * file list exactly as it would against a live directory scan. */
  def readVersion(spark: SparkSession, path: String, v: Int): DataFrame =
    readFiles(spark, path, manifest(path, v))
}
