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

  /** The version number the next build/compaction should stage under.
    * REFUSES while a torn replay-safe append is pending ([[appendOnce]]'s
    * intent manifests): a rebuild/compact folds the torn batch's partial
    * files into the next version under NEW file names, where the replay's
    * recovery can no longer find them — the replay would then re-append
    * the whole batch on top, silently double-counting (the exact
    * corruption the protocol exists to prevent). Resolve first: replay
    * the batch (self-heals), or [[abandonTornAppends]] to discard it. */
  def nextVersion(spark: SparkSession, root: String): Long = {
    val torn = pendingIntents(spark, root)
    require(torn.isEmpty,
      s"$root has ${torn.size} torn append(s) pending (${torn.mkString(", ")}) " +
        "— a rebuild/compact would orphan their partial files and a later " +
        "replay would double-count; replay the batch to self-heal, or " +
        "IndexLifecycle.abandonTornAppends(root) to discard it")
    currentVersion(spark, root).getOrElse(0L) + 1
  }

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
                    next: Long): Unit =
    writeAtomic(spark, root, pointerName, next.toString)

  /** Atomic small-file write: sweep crashed-write debris, write-temp,
    * rename-overwrite (FileContext exposes the atomic-overwrite rename
    * publicly). The pointer flip and the replay markers both ride this. */
  private def writeAtomic(spark: SparkSession, parent: String, name: String,
                          content: String): Unit = {
    val f = fs(spark, parent)
    sweepStaleTmp(f, parent, name)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$parent/$name.tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(new org.apache.hadoop.fs.Path(parent).toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(s"$parent/$name"),
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

  // ──────────────────── replay-safe append protocol ────────────────────
  //
  // `foreachBatch` is at-least-once: a micro-batch that fails after SOME of
  // its append-mode writes landed is re-delivered wholesale, and a raw
  // re-append double-counts (BM25 df/tf partials, gram counts, duplicate
  // signature rows — silently wrong answers, not crashes). This protocol
  // gives any append-maintained artifact the [[graft.streaming.SnapshotSink]]
  // (runId, batchId) idempotence, generalized from "merge one table" to
  // "append N part-files across M sub-tables":
  //
  //   guard   read `root/_appends/run-<tag(runId)>`; committed ⇒ no-op
  //   recover a leftover `intent-<tag>-<batch>` manifest lists every live
  //           file a torn attempt may have moved — delete them all
  //   stage   the caller writes the batch's tables under
  //           `root/_staging/<tag>-<batch>` (fresh dir, overwrite mode)
  //   intent  the staged part-file → live-file map is committed atomically
  //           BEFORE any live-dir mutation
  //   move    each staged file renames into the live dir under a
  //           batch-stamped name (`b-<tag>-<batch>-part-…`)
  //   marker  `run-<tag>` flips to this batchId atomically, LAST
  //
  // A crash at ANY point replays into either the guard (marker written ⇒
  // pure no-op) or the recover+restage path (marker unwritten ⇒ every
  // stamped file the attempt moved is removed before the re-append) — so
  // the post-replay artifact always equals exactly-once appends. Underscore
  // prefixes keep `_appends`/`_staging` invisible to readers (Spark's file
  // index skips `_*` paths without `=`), and markers live at the artifact
  // ROOT so they survive a compaction's version flip. Single-writer per
  // artifact (the [[flipPointer]] contract) is assumed: recovery reasons
  // about ONE torn attempt, and an append must never race a compact — a
  // compact folds a torn batch's partial files into the next version,
  // where recovery can no longer find them.

  private val AppendsName = "_appends"
  private val StagingName = "_staging"

  /** Filesystem-safe tag for a runId (which is often a checkpoint PATH —
    * slashes and all); the raw id rides inside the marker file for audit. */
  private def runTag(runId: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(runId.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Highest batchId committed into `root` by [[appendOnce]] under this
    * runId — None if this run never committed here (raw append*
    * maintenance leaves no markers). */
  def lastAppendedBatch(spark: SparkSession, root: String,
                        runId: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new org.apache.hadoop.fs.Path(
      s"$root/$AppendsName/run-${runTag(runId)}")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val first = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next().trim finally in.close()
      Some(first.toLongOption.getOrElse(throw new IllegalStateException(
        s"replay marker $p holds '$first', not a batch id")))
    }
  }

  /**
   * Run `stage` (which must write the batch's tables under the staging
   * dir it receives, overwrite mode, mirroring the live sub-table layout)
   * with EXACTLY-ONCE effect on the artifact under micro-batch replay.
   * Returns false when the (runId, batchId) was already committed — the
   * replay no-op. `runId` must be restart-stable — the checkpoint path or
   * `query.id`, NOT `query.runId` (Spark assigns a fresh runId per restart
   * while batchIds continue, which would disable the guard in exactly the
   * crash-restart-replay case it exists for; the [[graft.streaming.SnapshotSink]]
   * rule). BatchIds are only compared within one runId, so a redeployment
   * with a fresh checkpoint (batchIds restart at 0) is a NEW run — never
   * mistaken for the old run's progress.
   */
  def appendOnce(spark: SparkSession, root: String, runId: String,
                 batchId: Long)(stage: String => Unit): Boolean =
    appendOnceImpl(spark, root, runId, batchId, stage, failAt = "")

  /** [[appendOnce]] with a crash-injection point for the replay tests:
    * `failAt` ∈ {"staged", "intent", "half-moved", "moved", "marked"}
    * throws after that protocol step, leaving exactly the torn (or, for
    * "marked", committed-with-debris) state a real crash there would
    * leave. */
  private[graft] def appendOnceImpl(spark: SparkSession, root: String,
                                    runId: String, batchId: Long,
                                    stage: String => Unit,
                                    failAt: String): Boolean = {
    require(runId.nonEmpty, "appendOnce needs a restart-stable runId")
    val f = fs(spark, root)
    val tag = runTag(runId)
    val dir = resolveDir(spark, root)
    val stagingRoot = s"$root/$StagingName/$tag-$batchId"
    val intentP = new org.apache.hadoop.fs.Path(
      s"$root/$AppendsName/intent-$tag-$batchId")
    if (lastAppendedBatch(spark, root, runId).exists(_ >= batchId)) {
      // committed — a crash between marker write and debris cleanup may
      // have left this batch's staging/intent behind; finish the cleanup
      f.delete(new org.apache.hadoop.fs.Path(stagingRoot), true)
      f.delete(intentP, false)
      return false
    }
    // torn previous attempt: the intent manifest lists every live file it
    // may have moved — delete them all (absent ones are no-ops), restage
    if (f.exists(intentP)) {
      val in = f.open(intentP)
      val rels = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toList finally in.close()
      rels.foreach(rel =>
        f.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), false))
    }
    f.delete(new org.apache.hadoop.fs.Path(stagingRoot), true)
    stage(stagingRoot)
    if (failAt == "staged") throw new IllegalStateException("failpoint: staged")
    val qStaging = f.makeQualified(new org.apache.hadoop.fs.Path(stagingRoot))
    val basePath = qStaging.toUri.getPath
    val moves = listFilesRec(f, qStaging)
      .filterNot(s => s.getPath.getName.startsWith("_") ||
        s.getPath.getName.startsWith("."))
      .map { s =>
        val rel = s.getPath.toUri.getPath.stripPrefix(basePath).stripPrefix("/")
        val slash = rel.lastIndexOf('/')
        val destRel =
          if (slash < 0) s"b-$tag-$batchId-$rel"
          else rel.substring(0, slash + 1) + s"b-$tag-$batchId-" +
            rel.substring(slash + 1)
        (s.getPath, destRel)
      }
    writeAtomic(spark, s"$root/$AppendsName", s"intent-$tag-$batchId",
      moves.map(_._2).mkString("\n"))
    if (failAt == "intent") throw new IllegalStateException("failpoint: intent")
    moves.zipWithIndex.foreach { case ((src, destRel), i) =>
      if (failAt == "half-moved" && i >= (moves.size + 1) / 2)
        throw new IllegalStateException("failpoint: half-moved")
      val dest = new org.apache.hadoop.fs.Path(s"$dir/$destRel")
      f.mkdirs(dest.getParent)
      if (!f.rename(src, dest))
        throw new IllegalStateException(s"append move $src -> $dest failed")
    }
    if (failAt == "moved") throw new IllegalStateException("failpoint: moved")
    writeAtomic(spark, s"$root/$AppendsName", s"run-$tag", s"$batchId\n$runId")
    if (failAt == "marked") throw new IllegalStateException("failpoint: marked")
    f.delete(new org.apache.hadoop.fs.Path(stagingRoot), true)
    f.delete(intentP, false)
    // committed batches never revisit their intent files — sweep this
    // run's older debris (a crash after an earlier marker write but
    // before ITS cleanup) so `_appends` stays one marker + live intents
    val appendsDir = new org.apache.hadoop.fs.Path(s"$root/$AppendsName")
    f.listStatus(appendsDir).toSeq
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith(s"intent-$tag-") &&
          n.stripPrefix(s"intent-$tag-").toLongOption.exists(_ <= batchId)
      }
      .foreach(s => f.delete(s.getPath, false))
    true
  }

  private def listFilesRec(f: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.flatMap { s =>
      if (s.isDirectory) listFilesRec(f, s.getPath) else Seq(s)
    }

  /** Intent-manifest names of torn (crashed-mid-protocol, not yet
    * replayed) [[appendOnce]] batches pending on this artifact. An intent
    * whose batch IS marked committed (a crash landed between the marker
    * write and the debris cleanup) is NOT torn — its files are live data;
    * it is excluded here and [[abandonTornAppends]] only sweeps its
    * manifest. Without this distinction, abandoning such debris would
    * DELETE COMMITTED DATA. */
  def pendingIntents(spark: SparkSession, root: String): Seq[String] =
    intentStatus(spark, root).collect { case (name, false) => name }

  /** Every intent manifest under the artifact with its committed flag:
    * (name, true) = stale debris of a committed batch (files are live),
    * (name, false) = genuinely torn attempt (files are partial). */
  private def intentStatus(spark: SparkSession,
                           root: String): Seq[(String, Boolean)] = {
    val f = fs(spark, root)
    val p = new org.apache.hadoop.fs.Path(s"$root/$AppendsName")
    if (!f.exists(p)) Nil
    else {
      val names = f.listStatus(p).toSeq.map(_.getPath.getName)
      val lastByTag: Map[String, Long] = names
        .filter(_.startsWith("run-"))
        .flatMap { n =>
          val mp = new org.apache.hadoop.fs.Path(s"$root/$AppendsName/$n")
          val in = f.open(mp)
          val first = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().next().trim finally in.close()
          first.toLongOption.map(n.stripPrefix("run-") -> _)
        }.toMap
      names.filter(_.startsWith("intent-")).sorted.map { n =>
        val rest = n.stripPrefix("intent-")
        val dash = rest.lastIndexOf('-')
        val committed = dash > 0 &&
          rest.substring(dash + 1).toLongOption.exists { b =>
            lastByTag.get(rest.substring(0, dash)).exists(_ >= b)
          }
        (n, committed)
      }
    }
  }

  /** Discard every torn append as if its batch never ran: delete the
    * intent-listed live files (the partial move), the staging debris, and
    * the manifests. The artifact is then exactly its last consistent
    * state; the abandoned batchIds stay UNMARKED, so a later replay of
    * the same (runId, batchId) appends cleanly rather than no-opping —
    * abandon discards the ATTEMPT, not the data's claim to exist. Use
    * before a rebuild/compact when the maintaining stream is gone for
    * good ([[nextVersion]] refuses while intents are pending). */
  def abandonTornAppends(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val dir = resolveDir(spark, root)
    intentStatus(spark, root).map { case (name, committed) =>
      val intentP = new org.apache.hadoop.fs.Path(s"$root/$AppendsName/$name")
      if (!committed) {
        // genuinely torn: remove the partial live files the attempt moved
        val in = f.open(intentP)
        val rels = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toList finally in.close()
        rels.foreach(rel =>
          f.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), false))
      }
      // committed debris: the files are LIVE DATA — sweep only the
      // manifest and staging leftovers
      f.delete(new org.apache.hadoop.fs.Path(
        s"$root/$StagingName/${name.stripPrefix("intent-")}"), true)
      f.delete(intentP, false)
      name
    }
  }

  // ───────────────────────── artifact audit ─────────────────────────

  /**
   * Inventory every artifact under `root` (each child directory is an
   * artifact root; `root` itself counts when it directly holds a pointer
   * or parquet): (artifact, kind, version, legacy_flags, stale_versions,
   * pending_intents) as a DataFrame. The legacy formats this engine
   * REFUSES to grow (pre-dl text postings, pre-`_sn` / STRING-shingle
   * signature tables, term-dictionary-less text indexes) refuse loudly at
   * the call that would corrupt them — but nothing short of hitting that
   * call tells an operator WHICH artifacts need a rebuild. This one
   * driver-side sweep (FS listings + parquet footer schemas, no data
   * read) answers it fleet-wide: schedule a rebuild for every row with
   * flags, a vacuum where stale_versions piles up, and investigate any
   * pending_intents (a torn replay-safe append whose stream never came
   * back — its next delivery will self-heal, a dead stream won't).
   *
   * Kind detection is structural: a `postings` sub-table is a text index
   * (positional when it carries `positions`), `codes` is a PQ index
   * (routed when `_centroids` rides beside it), bare `_centroids` is raw
   * IVF, a root table with `_sig` is a signature table, `(_h, _n)` is a
   * gram index, `(_s, _k)` is shingle postings; anything else reports
   * kind "unknown" with no flags rather than guessing.
   */
  def auditArtifacts(spark: SparkSession, root: String)
      : org.apache.spark.sql.DataFrame = {
    val f = fs(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val candidates: Seq[String] =
      if (!f.exists(rootPath)) Nil
      else {
        val children = f.listStatus(rootPath).toSeq.filter(_.isDirectory)
          .map(_.getPath.toString)
          .filterNot { p =>
            val n = new org.apache.hadoop.fs.Path(p).getName
            (n.startsWith("_") && !n.contains("=")) || n.startsWith(".")
          }
        val selfIsArtifact =
          f.exists(new org.apache.hadoop.fs.Path(s"$root/_current")) ||
            f.listStatus(rootPath).exists(s => !s.isDirectory &&
              s.getPath.getName.endsWith(".parquet"))
        if (selfIsArtifact) Seq(root) else children
      }
    // a corrupt artifact (non-numeric _current pointer, unreadable
    // footer) must SURFACE in the inventory, not kill the sweep whose
    // purpose is finding exactly such breakage
    val rows = candidates.map { c =>
      scala.util.Try(auditOne(spark, f, c)) match {
        case scala.util.Success(row) => row
        case scala.util.Failure(e) =>
          org.apache.spark.sql.Row(c, "unknown", null,
            Seq(s"unreadable artifact: ${e.getMessage}"), 0,
            scala.util.Try(pendingIntents(spark, c).size).getOrElse(0))
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("artifact",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("legacy_flags",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, containsNull = false),
          nullable = false),
        org.apache.spark.sql.types.StructField("stale_versions",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("pending_intents",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
  }

  private def auditOne(spark: SparkSession,
                       f: org.apache.hadoop.fs.FileSystem,
                       artifact: String): org.apache.spark.sql.Row = {
    val version = currentVersion(spark, artifact)
    val dir = resolveDir(spark, artifact)
    def schemaOf(path: String)
        : Option[org.apache.spark.sql.types.StructType] =
      if (!tableExists(spark, path)) None
      else scala.util.Try(spark.read.parquet(path).schema).toOption
    val flags = scala.collection.mutable.ArrayBuffer[String]()
    val kind: String = schemaOf(s"$dir/postings") match {
      case Some(p) if p.fieldNames.contains("positions") => "phrase-index"
      case Some(p) =>
        if (!p.fieldNames.contains("dl"))
          flags += "pre-dl postings: appendTextIndex refuses; rebuild with buildTextIndex"
        if (!tableExists(spark, s"$dir/terms"))
          flags += "no terms dictionary: df recomputed from postings per probe; rebuild or compact to materialize"
        "text-index"
      case None => schemaOf(s"$dir/codes") match {
        case Some(_) =>
          if (tableExists(spark, s"$dir/_centroids")) "pq-ivf-index"
          else "pq-index"
        case None if tableExists(spark, s"$dir/_centroids") => "ivf-index"
        case None => schemaOf(dir) match {
          case Some(s) if s.fieldNames.contains("_sig") =>
            if (!s.fieldNames.contains("_sn"))
              flags += "pre-_sn signatures: shingleN unverifiable on append/probe; rebuild with buildSignatures"
            s.fields.find(_.name == "_sh").map(_.dataType).foreach {
              case org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.StringType, _) =>
                flags += "legacy STRING shingle sets: appends refuse, verifies pay string decode; rebuild with buildSignatures"
              case _ => ()
            }
            "signature-table"
          case Some(s) if s.fieldNames.contains("_h") &&
              s.fieldNames.contains("_n") =>
            if (!s.fieldNames.contains("_gk"))
              flags += "pre-_gk gram index: gram width unverifiable on append/probe; rebuild with buildGramIndex"
            "gram-index"
          case Some(s) if s.fieldNames.contains("_k") &&
              s.fieldNames.contains("_s") =>
            if (!s.fieldNames.contains("_sn"))
              flags += "pre-_sn shingle postings: shingle width unverifiable on append; rebuild with buildShinglePostings"
            "shingle-postings"
          case _ => "unknown"
        }
      }
    }
    val stale = version.map { cur =>
      f.listStatus(new org.apache.hadoop.fs.Path(artifact)).toSeq
        .count(s => s.isDirectory && s.getPath.getName.startsWith("v=") &&
          s.getPath.getName.stripPrefix("v=").toLongOption.exists(_ != cur))
    }.getOrElse(0)
    // torn only: an intent whose batch committed is debris, not pending
    val pending = pendingIntents(spark, artifact).size
    org.apache.spark.sql.Row(artifact, kind,
      version.map(Long.box).orNull, flags.toSeq, stale, pending)
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
