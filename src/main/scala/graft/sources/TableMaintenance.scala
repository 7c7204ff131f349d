package graft.sources

import org.apache.spark.sql.SparkSession

/** The OPTIMIZE scheduler face of the lakehouse tier (r12 verdict
  * #5): tranches 16-20 built the maintenance VERBS — compaction
  * ([[SnapshotTable.compactCommit]]), retention
  * ([[SnapshotTable.expireVersions]]) — and this is the POLICY LOOP a
  * real deployment runs around them: watch the manifest stats, decide
  * from metadata alone, drive the verbs, report what was done. The
  * decision pass is a pure driver-side manifest walk (layout-sized,
  * the Iceberg planning stance): at 100 TB deciding "which partitions
  * are fragmented" must never cost a data scan, and here it reads one
  * small text file.
  *
  * Policy knobs:
  *  - `maxFilesPerPartition`: a partition fragmented past this many
  *    files gets rewritten (compactCommit also folds in any delete
  *    mask that can still reach a rewritten partition, ending the
  *    mask's MOR read debt);
  *  - `keepVersions`: history beyond the most recent K versions is
  *    expired and its orphaned files reclaimed.
  *
  * The loop CONVERGES: after one pass every partition is at one file,
  * no live mask reaches any file, and the live history is ≤ K — so a
  * second pass plans zero actions (idempotence, spec-pinned). Under
  * concurrent writers each verb commits through the OCC loop, so the
  * scheduler can run beside a streaming ingest (the
  * [[graft.streaming.SnapshotIngest.startMaintained]] composition).
  *
  * Reference scope: the reference has no table format and no
  * maintenance (`/root/reference/src/Datalake2Anomali.py:246-253`
  * just POSTs rows); this extends SURVEY §7.2's lakehouse tier. */
object TableMaintenance {

  /** What one maintenance pass should do / did. `before`/`after` are
    * the action's own metric: files in the rewritten partitions for
    * `compact`, live delete masks for `retire_masks`, live manifest
    * count for `vacuum`. */
  case class Action(action: String, before: Long, after: Long)

  case class Policy(maxFilesPerPartition: Int = 1, keepVersions: Int = 1)

  /** The DECISION pass: from the current manifest only, which
    * partitions does `policy` rewrite and does history need expiring?
    * Returns (partitions to compact, masks retirable by the rewrite,
    * keepFrom for vacuum or 0). Pure metadata — no Spark job. */
  def plan(path: String, policy: Policy): (Set[String], Int, Int) = {
    require(policy.keepVersions >= 1,
      s"keepVersions must be >= 1 (the current version is always " +
        s"retained), got ${policy.keepVersions}")
    require(policy.maxFilesPerPartition >= 1,
      s"maxFilesPerPartition must be >= 1, got ${policy.maxFilesPerPartition}")
    val cur = SnapshotTable.currentVersion(path)
    require(cur > 0, s"$path has no initial commit")
    val files = SnapshotTable.manifest(path, cur)
    val masks = SnapshotTable.deleteManifest(path, cur).filter(_.rows > 0)
    def maskReaches(e: SnapshotTable.FileEntry): Boolean = masks.exists(d =>
      SnapshotTable.seqOf(d) > SnapshotTable.seqOf(e) &&
        d.max >= e.min && d.min <= e.max)
    val fragmented = files.groupBy(_.rel.split("/").head).collect {
      case (p, fs)
        if fs.size > policy.maxFilesPerPartition || fs.exists(maskReaches) =>
        p
    }.toSet
    val live = SnapshotTable.liveVersions(path)
    val keepFrom =
      if (live.size > policy.keepVersions)
        live(live.size - policy.keepVersions)
      else 0
    (fragmented, masks.size, keepFrom)
  }

  /** One maintenance pass: compact if the plan says so (one commit),
    * then expire history past the retention bound. Returns the
    * actions actually taken, in order — empty when the table is
    * already converged. */
  def runOnce(spark: SparkSession, path: String, partCol: String,
      keyCol: String, statsCol: String,
      policy: Policy = Policy(),
      bloomCol: Option[String] = None): Seq[Action] = {
    val (fragmented, masksBefore, keepFrom0) = plan(path, policy)
    val compacted =
      if (fragmented.isEmpty) Nil
      else {
        val v = SnapshotTable.currentVersion(path)
        val before = SnapshotTable.manifest(path, v)
          .count(e => fragmented(e.rel.split("/").head)).toLong
        val v2 = SnapshotTable.compactCommit(spark, path, partCol, keyCol,
          statsCol, bloomCol, policy.maxFilesPerPartition)
        val after = SnapshotTable.manifest(path, v2)
          .count(e => fragmented(e.rel.split("/").head)).toLong
        val masksAfter =
          SnapshotTable.deleteManifest(path, v2).count(_.rows > 0).toLong
        Seq(Action("compact", before, after)) ++
          (if (masksBefore > 0)
            Seq(Action("retire_masks", masksBefore.toLong, masksAfter))
          else Nil)
      }
    // re-plan retention AFTER the compaction commit extended history
    val (_, _, keepFrom) =
      if (compacted.isEmpty) (Set.empty[String], 0, keepFrom0)
      else plan(path, policy)
    val vacuumed =
      if (keepFrom <= 1) Nil
      else {
        val before = SnapshotTable.liveVersions(path).size.toLong
        SnapshotTable.expireVersions(spark, path, keepFrom)
        Seq(Action("vacuum", before,
          SnapshotTable.liveVersions(path).size.toLong))
      }
    compacted ++ vacuumed
  }
}
