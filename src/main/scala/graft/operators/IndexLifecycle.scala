package graft.operators

import org.apache.spark.sql.SparkSession

/**
 * CAS-versioned artifact lifecycle — ONE implementation of the
 * version-directory + pointer-flip discipline shared by every prebuilt
 * serving artifact (text index, positional phrase index, PQ codes, IVF
 * lists). Reference analogue: the always-maintained bucket index whose
 * rebuilds must never tear a concurrent reader
 * (app/core/hydra/swamp/beacon/bucket.go:215-330); the [[Snapshots]] CAS
 * mechanism generalized from snapshots to index artifacts.
 *
 * Layout: `root/v=N/...` immutable version directories plus a `_current`
 * pointer file holding the committed version number. A writer stages the
 * complete new version under `v=N+1` and flips the pointer LAST
 * (write-temp + atomic rename-overwrite), so a concurrent reader either
 * resolves the old version — whose files are never touched — or the new
 * one; never a torn mix. A legacy flat layout (tables directly under the
 * root, no pointer) resolves to the root itself and stays readable.
 *
 * Single-WRITER contract: the pointer protects readers from rebuilds, not
 * two concurrent writers from each other — append and rebuild/compact must
 * not run concurrently (the reference's compactor holds the same
 * exclusivity).
 */
object IndexLifecycle {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed version, None for a legacy flat layout. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    currentVersionAt(spark, root, "_current")

  /** [[currentVersion]] generalized over the pointer file name — the
    * snapshot family uses `_latest`; [[graft.operators.Bundles]] round
    * trips both families through this one reader. */
  def currentVersionAt(spark: SparkSession, root: String,
                       pointerName: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new org.apache.hadoop.fs.Path(s"$root/$pointerName")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(s.toLongOption.getOrElse(throw new IllegalStateException(
        s"index pointer $p holds '$s', not a version number")))
    }
  }

  /** Directory holding the artifact tables: `root/v=N` when versioned,
    * the root itself for a legacy flat layout. */
  def resolveDir(spark: SparkSession, root: String): String =
    currentVersion(spark, root).map(v => s"$root/v=$v").getOrElse(root)

  /** Does an artifact sub-table exist at `path`? A driver-side FS probe —
    * the serving paths use it to pick between a denormalized metadata
    * table and the legacy recompute-from-postings fallback. */
  def tableExists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  /** The version number the next build/compaction should stage under. */
  def nextVersion(spark: SparkSession, root: String): Long =
    currentVersion(spark, root).getOrElse(0L) + 1

  /** Atomic pointer flip: write-temp + rename-overwrite (FileContext
    * exposes the atomic-overwrite rename publicly). Also sweeps any
    * `_current.tmp.*` debris a previous writer left by dying between
    * create and rename — safe under the single-writer contract, and
    * without it crashed-flip temp files would accumulate forever. */
  def flipPointer(spark: SparkSession, root: String, next: Long): Unit =
    flipPointerAt(spark, root, "_current", next)

  /** [[flipPointer]] generalized over the pointer file name (same atomic
    * write-temp + rename-overwrite + stale-tmp sweep for `_latest`-family
    * artifacts — [[graft.operators.Bundles]] imports flip through this). */
  def flipPointerAt(spark: SparkSession, root: String, pointerName: String,
                    next: Long): Unit = {
    val f = fs(spark, root)
    sweepStaleTmp(f, root, pointerName)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$root/$pointerName.tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(new org.apache.hadoop.fs.Path(root).toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(s"$root/$pointerName"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def sweepStaleTmp(f: org.apache.hadoop.fs.FileSystem,
                            root: String,
                            pointerName: String = "_current"): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (f.exists(rootPath))
      f.listStatus(rootPath).toSeq
        .filter(s => !s.isDirectory &&
          s.getPath.getName.startsWith(s"$pointerName.tmp."))
        .foreach(s => f.delete(s.getPath, false))
  }

  /** Delete every non-current version directory plus any crashed-flip
    * `_current.tmp.*` files. Only safe once no reader still holds a
    * pre-flip file list (the [[Snapshots.vacuum]] caveat verbatim). A
    * legacy flat layout has nothing to vacuum (tmp debris is still
    * swept — a flat root can carry it if a first versioning flip died). */
  def vacuum(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    sweepStaleTmp(f, root)
    currentVersion(spark, root).foreach { cur =>
      f.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
        .filter(_.isDirectory)
        .filter(s => s.getPath.getName.startsWith("v=") &&
          s.getPath.getName.stripPrefix("v=").toLongOption.exists(_ != cur))
        .foreach(s => f.delete(s.getPath, true))
    }
  }
}
