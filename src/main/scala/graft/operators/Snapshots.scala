package graft.operators

import org.apache.hadoop.fs.{FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned snapshot tables with an atomically-swapped pointer — the
 * minimal transactional sink the mutation operators need for write-back.
 * The reference gets atomicity from single-writer per-swamp files (write
 * new chronicle, swap — app/core/hydra/swamp/chronicler/v2/writer.go,
 * compactor.go); the distributed analogue is: write an immutable version
 * directory, then flip one pointer file via an atomic rename.
 *
 * Layout: `<table>/v=<N>/…parquet`, `<table>/_latest` containing N.
 * Guarantees:
 *  - readers resolve `_latest` once and then read only immutable files —
 *    a concurrent commit can never show them a half-written version;
 *  - commits are last-writer-wins on the pointer (optimistic; callers that
 *    need compare-and-swap semantics check `currentVersion` before
 *    committing and retry on mismatch);
 *  - old versions stay readable until [[vacuum]] — time travel for free.
 *
 * This is deliberately a pointer-swap design, not a log-structured table
 * format: the engine's mutations are whole-relation rewrites (Set matrix,
 * shift survivors, compaction), so one pointer per table is sufficient and
 * every storage scheme with atomic rename (HDFS, posix) supports it.
 */
object Snapshots {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(s"$dir/_latest")

  /** Latest committed version, if any. */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(pointer(dir))) None
    else {
      val in = f.open(pointer(dir))
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Write `df` as the next immutable version and atomically flip the
    * pointer. Returns the committed version number. */
  def commit(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val next = currentVersion(spark, dir).map(_ + 1).getOrElse(0L)
    df.write.mode("errorifexists").parquet(s"$dir/v=$next")
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/_latest.tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    // FileContext.rename exposes the atomic-overwrite flavor publicly
    // (FileSystem's 2-arg rename refuses an existing destination)
    org.apache.hadoop.fs.FileContext
      .getFileContext(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, pointer(dir), Options.Rename.OVERWRITE)
    next
  }

  /**
   * Compare-and-swap commit — the distributed analogue of the reference's
   * per-swamp single-writer guarantee (reference: app/core/hydra/lock/
   * lock.go:13-70 serializes all writes per swamp; per-key guard
   * guard.go): write `df` as version `expected+1` ONLY if the table is
   * still at `expected` (None = must be empty). Returns Some(version) on
   * success, None on a detected conflict — never a silent clobber.
   *
   * Two racing committers cannot both win: they target the same `v=N+1`
   * directory and the `errorifexists` parquet write is the exclusivity
   * gate (a filesystem-atomic mkdir under every Hadoop FS), so the loser
   * fails before the pointer flip; the pointer is re-checked after the
   * data write for the belt-and-braces case of a committer that raced a
   * full commit+vacuum cycle. Callers retry by re-reading, re-merging,
   * and calling commitIf with the fresh version.
   */
  def commitIf(df: DataFrame, dir: String, expected: Option[Long]): Option[Long] = {
    val spark = df.sparkSession
    if (currentVersion(spark, dir) != expected) return None
    val next = expected.map(_ + 1).getOrElse(0L)
    try df.write.mode("errorifexists").parquet(s"$dir/v=$next")
    catch { case _: org.apache.spark.sql.AnalysisException => return None }
    if (currentVersion(spark, dir) != expected) return None
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/_latest.tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, pointer(dir), Options.Rename.OVERWRITE)
    Some(next)
  }

  /** Read the latest snapshot (or a pinned historical `version`). */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $dir"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /**
   * Durable Set: merge a delta into the latest snapshot with the full
   * [[Mutations.set]] matrix semantics and commit the post-state as the
   * next version (first commit = the delta itself for createable modes).
   * This is the write-back loop of the reference's Set RPC — read current
   * swamp state, apply the upsert matrix, persist atomically — expressed
   * as snapshot-in, snapshot-out. Returns the committed version.
   */
  def mergeCommit(spark: SparkSession, dir: String, delta: DataFrame,
                  keyCol: String,
                  mode: Mutations.WriteMode = Mutations.Upsert): Long = {
    val next = currentVersion(spark, dir) match {
      case None =>
        mode match {
          case Mutations.Upsert | Mutations.InsertOnly => delta
          case _ => delta.limit(0) // nothing to update against
        }
      case Some(v) =>
        Mutations.set(read(spark, dir, Some(v)), delta, keyCol, mode)
          .drop("_status")
    }
    commit(next, dir)
  }

  /** Drop all versions strictly older than `keepFrom`. */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long): Unit = {
    val f = fs(spark, dir)
    val st = f.listStatus(new Path(dir))
    st.filter(_.getPath.getName.startsWith("v="))
      .filter(_.getPath.getName.stripPrefix("v=").toLong < keepFrom)
      .foreach(s => f.delete(s.getPath, true))
  }
}
