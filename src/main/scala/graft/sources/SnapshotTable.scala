package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal manifest-committed table format with snapshot isolation,
  * time travel, and FILE-LEVEL STATS PRUNING — the metadata layer
  * (Iceberg/Delta's essential move) that q59's directory-swap COW
  * cannot give: q59 rewrites a partition IN PLACE, so the pre-upsert
  * table is gone the moment the rename lands. Here a commit never
  * mutates or deletes a data file; it writes NEW files plus a
  * manifest (the ordered list of data files that ARE version N, each
  * with min/max/rowcount stats on a declared stats column), so every
  * historical version stays readable forever and a reader holding
  * version N is immune to concurrent commits (snapshot isolation by
  * construction).
  *
  * Layout under `path`:
  *   files/<partCol>=<v>/c<N>-<uuid>.parquet   -- immutable data files
  *   manifests/v<N>.txt   -- relpath \t min \t max \t rows per line
  *
  * Scale stance (100 TB):
  *  - manifests are LAYOUT-sized (one line per data file), never
  *    data-sized — reading one is a driver-side metadata op, exactly
  *    what Iceberg's manifest lists are;
  *  - an upsert commit costs one partition read+write plus a
  *    manifest write: untouched partitions contribute their existing
  *    files to the new manifest BY REFERENCE (file sharing across
  *    versions — the spec proves v1 ∩ v2 is every file outside the
  *    touched partition);
  *  - per-file stats ride IN the manifest, so a key-range predicate
  *    prunes files before any parquet footer is opened — at 100 TB
  *    that's the difference between "plan from one small metadata
  *    file" and "issue a million object-store GETs to read footers"
  *    ([[readVersionPruned]]; stats come from ONE distributed
  *    `input_file_name()` aggregation over the staged files, never a
  *    driver-side per-file loop);
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

  /** One manifest line: a data file and its stats on the table's
    * declared stats column. */
  case class FileEntry(rel: String, min: Long, max: Long, rows: Long)

  private def filesDir(path: String) = s"$path/files"
  private def manifestFile(path: String, v: Int) =
    Paths.get(s"$path/manifests/v$v.txt")

  /** Manifest entries of version `v`. */
  def manifest(path: String, v: Int): Seq[FileEntry] =
    Files.readAllLines(manifestFile(path, v), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty).map { line =>
        val p = line.split("\t")
        FileEntry(p(0), p(1).toLong, p(2).toLong, p(3).toLong)
      }

  /** Latest committed version (0 if none). */
  def currentVersion(path: String): Int = {
    val dir = new File(s"$path/manifests")
    if (!dir.isDirectory) 0
    else Option(dir.listFiles).toSeq.flatten
      .map(_.getName).collect { case s if s.startsWith("v") =>
        s.stripPrefix("v").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)
  }

  /** Stage `df` partitioned by `partCol`, collect per-file stats on
    * `statsCol` with one distributed aggregation, then move the
    * part-files into the shared `files/` tree under commit-tagged
    * names. Returns the new files' manifest entries. */
  private def stageFiles(df: DataFrame, path: String, partCol: String,
      statsCol: String, commit: Int): Seq[FileEntry] = {
    val spark = df.sparkSession
    val stage = new File(s"$path/_stage_$commit")
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(stage.toString)
    // one pass over the staged files — stats per physical file
    val stats = spark.read.parquet(stage.toString)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(statsCol)).cast("long").as("mn"),
        max(col(statsCol)).cast("long").as("mx"),
        count(lit(1)).as("rows"))
      .collect()
      .map { r =>
        val local = new File(new java.net.URI(r.getString(0)).getPath)
        local.getParentFile.getName + "/" + local.getName ->
          (r.getLong(1), r.getLong(2), r.getLong(3))
      }.toMap
    val moved = FileFormats.listPartFiles(stage).map { f =>
      val partDir = f.getParentFile.getName // partCol=value
      val destDir = new File(s"${filesDir(path)}/$partDir")
      destDir.mkdirs()
      val name = s"c$commit-${f.getName.stripPrefix("part-")}"
      val (mn, mx, rows) = stats(s"$partDir/${f.getName}")
      Files.move(f.toPath, new File(destDir, name).toPath,
        StandardCopyOption.ATOMIC_MOVE)
      FileEntry(s"$partDir/$name", mn, mx, rows)
    }
    def rm(f: File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(stage)
    moved.sortBy(_.rel)
  }

  private def commitManifest(path: String, v: Int,
      files: Seq[FileEntry]): Unit = {
    val target = manifestFile(path, v)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".v$v.tmp")
    val body = files.map(e => s"${e.rel}\t${e.min}\t${e.max}\t${e.rows}")
      .mkString("\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Initial commit: all of `df` becomes version 1. `statsCol` is the
    * table's declared stats column (long-valued), tracked per file in
    * every manifest. */
  def init(spark: SparkSession, df: DataFrame, path: String,
      partCol: String, statsCol: String): Int = {
    require(currentVersion(path) == 0, s"$path already has commits")
    commitManifest(path, 1, stageFiles(df, path, partCol, statsCol, 1))
    1
  }

  /** Upsert commit: rows of `delta` replace same-`keyCol` rows in the
    * partitions the delta touches; every other partition's files
    * carry over by reference (stats included). Returns the new
    * version. */
  def upsertPartition(spark: SparkSession, path: String, delta: DataFrame,
      partCol: String, keyCol: String, statsCol: String): Int = {
    val v = currentVersion(path)
    require(v > 0, s"$path has no initial commit")
    // layout-sized by design: partition values are the directory
    // fan-out (the cowUpsertByPartition argument)
    val affected = delta.select(col(partCol).cast("string")).distinct()
      .collect().map(r => s"$partCol=${r.getString(0)}").toSet
    val prev = manifest(path, v)
    val (replaced, kept) = prev.partition(e => affected(e.rel.split("/").head))
    require(replaced.nonEmpty, "delta touches no existing partition")
    val base = readFiles(spark, path, replaced.map(_.rel))
    val merged = base
      .join(delta.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(delta)
    val newFiles = stageFiles(merged, path, partCol, statsCol, v + 1)
    commitManifest(path, v + 1, (kept ++ newFiles).sortBy(_.rel))
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
    readFiles(spark, path, manifest(path, v).map(_.rel))

  /** Read version `v` restricted to `statsCol ∈ [lo, hi]`, planning
    * from MANIFEST STATS: files whose [min, max] misses the range are
    * dropped before Spark ever lists or opens them (no footer reads,
    * no object-store GETs — Iceberg's scan planning). The surviving
    * files still get the row-level filter; stats only prune, never
    * decide membership. Returns (frame, files read, files in
    * manifest) so callers/specs can assert the skip rate. */
  def readVersionPruned(spark: SparkSession, path: String, v: Int,
      statsCol: String, lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val all = manifest(path, v)
    val live = all.filter(e => e.max >= lo && e.min <= hi)
    val pred = col(statsCol) >= lo && col(statsCol) <= hi
    val df =
      if (live.isEmpty) readFiles(spark, path, all.map(_.rel)).filter(lit(false))
      else readFiles(spark, path, live.map(_.rel)).filter(pred)
    (df, live.size, all.size)
  }
}
