package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Point-in-time backup/restore BUNDLES for CAS-versioned artifacts — the
 * engine's parity with the reference's `hydraidectl backup` / `restore`
 * (reference `app/hydraidectl/cmd/backup.go:20-41`, `restore.go:41-120`:
 * copy the instance's data tree out for disaster recovery, replace it on
 * restore, keeping the displaced data until the restore is known-good).
 *
 * Here the unit of backup is one CAS-versioned artifact root — a snapshot
 * table ([[Snapshots]], pointer file `_latest`) or a serving index
 * ([[IndexLifecycle]]-managed: text/gram/signature/PQ artifacts, pointer
 * file `_current`) — and the consistency story is STRONGER than the
 * reference's stop-the-instance rule: version directories are immutable
 * once their pointer flipped, so exporting `v=N` needs no quiescence at
 * all (the no-stop backup the reference warns about is safe here by
 * construction). Appends into the CURRENT version are the one exception,
 * and the inventory check catches a file that changed size mid-copy.
 *
 * Torn-bundle discipline: the bundle's `_manifest` (header, pointer name,
 * intended current version, version list, full file inventory with byte
 * sizes) is written LAST — a bundle whose writer died mid-copy has no
 * manifest and is refused by import; a bundle missing listed bytes (a
 * partial transfer, a truncated file) is refused BEFORE anything is
 * written to the target. This is the flip-pointer-last rule applied to
 * the backup medium.
 *
 * Import safety (the restore.go `data.old.<ts>` rollback, strengthened by
 * CAS): importing into a LIVE artifact never touches existing version
 * directories — bundled versions land under FRESH version numbers and the
 * pointer flips only after every file is in place, so a reader mid-query
 * keeps its pre-import file list (the rebuild-under-live-reader pin) and
 * rollback is `flipPointer(old)` + vacuum rather than a directory swap.
 *
 * Scale shape: export/import move bytes with per-file streamed copies on
 * a bounded driver-side pool — file COUNT is bounded by the artifact's
 * own layout (one artifact, a few versions, each sized-by-build), not by
 * corpus rows. Cross-cluster DR of a multi-PB artifact estate would hand
 * the same manifest to a distcp-class job; the manifest format is plain
 * text precisely so external movers can verify it.
 */
object Bundles {

  /** What a bundle holds / what an import produced: the pointer file name
    * (`_current` vs `_latest`), the current version (post-remap for
    * imports), every bundled/imported version, and the file/byte tally. */
  final case class BundleInfo(pointerName: String, current: Long,
                              versions: Seq[Long], files: Long, bytes: Long)

  private val PointerNames = Seq("_current", "_latest")
  private val ManifestName = "_manifest"
  private val Header = "graft-bundle v1"
  private val CopyThreads = 8

  private def fsFor(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The artifact's pointer file (name, value), across both artifact
    * families — [[IndexLifecycle.currentVersionAt]] per candidate name. */
  private def pointer(spark: SparkSession, root: String): Option[(String, Long)] =
    PointerNames.iterator.flatMap { n =>
      IndexLifecycle.currentVersionAt(spark, root, n).map(n -> _)
    }.nextOption()

  private def listVersions(f: FileSystem, root: String): Seq[Long] = {
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .flatMap(_.stripPrefix("v=").toLongOption).sorted
  }

  /** Recursive (relativePath, bytes) inventory of one version dir. */
  private def inventory(f: FileSystem, rootQ: String,
                        dir: Path): Seq[(String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = f.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      val s = st.getPath.toString
      require(s.startsWith(rootQ + "/"),
        s"listed file $s escapes the artifact root $rootQ")
      out += s.stripPrefix(rootQ + "/") -> st.getLen
    }
    out.toSeq
  }

  /** Streamed per-file copies on a bounded pool; any failure propagates. */
  private def copyFiles(srcFs: FileSystem, srcRootQ: String,
                        dstFs: FileSystem, dstRoot: String,
                        files: Seq[(String, String)]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(CopyThreads, math.max(1, files.size)))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = files.map { case (srcRel, dstRel) =>
        new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val in = srcFs.open(new Path(s"$srcRootQ/$srcRel"))
            try {
              val out = dstFs.create(new Path(s"$dstRoot/$dstRel"), false)
              try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
              finally out.close()
            } finally in.close()
          }
        }
      }
      pool.invokeAll(tasks.asJava).asScala.foreach(_.get()) // rethrow first failure
    } finally pool.shutdown()
  }


  /**
   * Export a CAS-versioned artifact into a write-once bundle directory.
   * Default = the CURRENT version only (point-in-time backup, the
   * `hydraidectl backup` shape); `version = Some(n)` exports that pinned
   * version; `allVersions = true` exports the whole history (pointer
   * included), for estate migration. Refuses a legacy unversioned root
   * (nothing immutable to copy — rebuild it under the CAS layout first)
   * and an existing bundle path (bundles are write-once by contract).
   */
  def exportBundle(spark: SparkSession, artifactRoot: String,
                   bundlePath: String, allVersions: Boolean = false,
                   version: Option[Long] = None): BundleInfo = {
    require(!(allVersions && version.nonEmpty),
      "pass allVersions OR a pinned version, not both")
    val f = fsFor(spark, artifactRoot)
    val (pname, cur) = pointer(spark, artifactRoot).getOrElse(
      throw new IllegalArgumentException(
        s"$artifactRoot has no CAS pointer (${PointerNames.mkString("/")}) " +
          "— only versioned artifacts bundle; rebuild it under the " +
          "versioned layout first"))
    val versions: Seq[Long] =
      if (allVersions) listVersions(f, artifactRoot)
      else Seq(version.getOrElse(cur))
    require(versions.nonEmpty, s"$artifactRoot holds no version directories")
    // a torn replay-safe append leaves PARTIAL batch files inside the
    // CURRENT version dir — a bundle including it would certify an
    // inconsistent state as a backup (restored during a disaster, noticed
    // never). Pinned non-current versions are immutable and unaffected.
    if (versions.contains(cur)) {
      val torn = IndexLifecycle.pendingIntents(spark, artifactRoot)
      require(torn.isEmpty,
        s"$artifactRoot has ${torn.size} torn append(s) pending " +
          s"(${torn.mkString(", ")}) — the current version holds partial " +
          "batch files; replay the batch to self-heal or " +
          "IndexLifecycle.abandonTornAppends first (or export a pinned " +
          "non-current version)")
      // an abandon sweep mid-deletion would race the copy below — the
      // inventory re-checks catch files that GROW or APPEAR, not ones
      // that vanish (the copy would fail loudly, but refuse up front)
      require(!IndexLifecycle.abandonSweepInfo(spark, artifactRoot)._2,
        s"$artifactRoot has an abandonTornAppends sweep in flight (or one " +
          "crashed mid-sweep) — its deletions would race the export copy; " +
          "wait for it (or rerun abandonTornAppends to complete a crashed " +
          "sweep), then re-run the export")
    }
    versions.foreach(v => require(
      f.exists(new Path(s"$artifactRoot/v=$v")),
      s"requested version $v missing under $artifactRoot"))
    // the version the restored artifact should point at: the live pointer
    // when it's in the bundle, else the newest bundled version
    val bundleCurrent = if (versions.contains(cur)) cur else versions.max
    val bf = fsFor(spark, bundlePath)
    require(!bf.exists(new Path(bundlePath)),
      s"bundle target $bundlePath already exists — bundles are write-once")
    val rootQ = f.makeQualified(new Path(artifactRoot)).toString
    val inv = versions.flatMap(v =>
      inventory(f, rootQ, new Path(s"$artifactRoot/v=$v")))
    // any failure from here leaves a MANIFEST-LESS directory — already
    // unusable by contract (the manifest is written last), but its
    // existence would trip the write-once check and permanently refuse
    // the retry; since the path did not exist before this call (required
    // above), the debris is entirely ours to best-effort remove
    try {
      copyFiles(f, rootQ, bf, bundlePath, inv.map { case (p, _) => (p, p) })
      // re-verify the copied bytes against the inventory BEFORE the manifest
      // certifies anything: a file that grew mid-copy (an append into the
      // CURRENT version racing the export) would otherwise produce a bundle
      // whose unrestorability is discovered at RESTORE time — during the
      // disaster, not during the backup
      inv.foreach { case (relp, len) =>
        val got = bf.getFileStatus(new Path(s"$bundlePath/$relp")).getLen
        if (got != len) throw new IllegalStateException(
          s"export raced a writer: $relp was $len bytes at inventory, " +
            s"$got after copy — re-run the export (or export a pinned " +
            "non-current version, which is immutable)")
      }
      // size re-verify only catches files that GREW — a Spark-style
      // append lands NEW part files, which the stale inventory never
      // listed; re-list each exported version and compare file SETS so a
      // half-visible multi-file append cannot certify a torn bundle
      val after = versions.flatMap(v =>
        inventory(f, rootQ, new Path(s"$artifactRoot/v=$v"))).map(_._1).toSet
      val missed = after -- inv.map(_._1).toSet
      if (missed.nonEmpty) throw new IllegalStateException(
        s"export raced a writer: ${missed.size} file(s) appeared in the " +
          s"source after the inventory listing (e.g. ${missed.head}) — " +
          "re-run the export (or export a pinned non-current version, " +
          "which is immutable)")
      // ...and files that VANISHED: an abandon sweep starting after the
      // fence pre-check above can delete a torn batch's files the copy
      // already shipped — the manifest would then certify partial batch
      // files a restore serves as live data with no record left
      val vanished = inv.map(_._1).toSet -- after
      if (vanished.nonEmpty) throw new IllegalStateException(
        s"export raced a deleter: ${vanished.size} file(s) vanished from " +
          s"the source after the inventory listing (e.g. ${vanished.head}" +
          ") — an abandonTornAppends sweep or vacuum ran mid-copy; " +
          "re-run the export once it completes")
      // old-run inventory: the raw runIds of every replay marker on the
      // source ride in the manifest so importBundle can BLOCK exactly
      // those runs on the restored artifact — closing the batch-0 replay
      // window no fresh-vs-resumed heuristic can close (a redelivered
      // batch 0 and a fresh run's batch 0 look identical by batchId).
      // The source's OWN restore sentinel is merged in: a restored-then-
      // maintained artifact carries its pre-restore blocked runs forward
      // (markers never travel, so the markers alone would launder them
      // out). `complete` only when markers all carry raw runIds, none
      // was skipped as corrupt, AND the source's own inventory was
      // complete — anything less and the import keeps the strict
      // mid-stream heuristic alongside the partial blocked set.
      val (markerIds, sawCorrupt) =
        IndexLifecycle.runMarkersWithHealth(spark, artifactRoot)
      val (_, srcComplete, srcBlocked) =
        IndexLifecycle.restoreInfo(spark, artifactRoot)
      val allRuns = (markerIds.collect { case (_, id, _) if id.nonEmpty => id }
        ++ srcBlocked).distinct.sorted
      val complete =
        !sawCorrupt && srcComplete && markerIds.forall(_._2.nonEmpty)
      val runLines =
        Seq(s"runs=${if (complete) "complete" else "incomplete"}") ++
          allRuns.map(id => s"run=${id.replace('\n', ' ')}")
      // manifest LAST: its presence certifies a complete bundle
      val lines = Seq(Header, s"pointer=$pname", s"current=$bundleCurrent") ++
        runLines ++
        versions.sorted.map(v => s"version=$v") ++
        inv.sorted.map { case (p, n) => s"file\t$p\t$n" }
      val out = bf.create(new Path(s"$bundlePath/$ManifestName"), false)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        try bf.delete(new Path(bundlePath), true)
        catch { case scala.util.control.NonFatal(_) => () } // keep the cause
        throw e
    }
    BundleInfo(pname, bundleCurrent, versions.sorted, inv.size,
      inv.map(_._2).sum)
  }

  /**
   * Import a bundle into `targetRoot`. A torn bundle — no manifest, a
   * listed file missing, or a byte-size mismatch — is refused BEFORE the
   * target is touched. A fresh/empty target receives the bundled version
   * numbers verbatim (the DR restore). A LIVE target is refused unless
   * `overwrite = true`, and even then nothing existing is modified:
   * bundled versions are renumbered after the target's newest (order
   * preserved — version continuity) and the pointer flips to the imported
   * current only once every file landed, so concurrent readers keep their
   * pre-import version (the rebuild-under-live-reader guarantee; roll
   * back by flipping the pointer to the old version). Importing a
   * `_latest`-family bundle onto a `_current`-family artifact (or vice
   * versa) is a category error and refused.
   *
   * Replay contract — MACHINE-ENFORCED: bundles carry VERSION DIRS only —
   * no `_appends` replay markers — so a restored artifact has no memory
   * of which (runId, batchId) appends its data already contains. A
   * streaming query that maintained the original MUST redeploy against
   * the restore with a FRESH checkpoint (new runId): resuming the old
   * checkpoint would replay its last in-flight batch, and with the
   * markers gone the replay guard cannot no-op it — the batch's rows,
   * already inside the bundled version, would append again. Every import
   * therefore bumps the target's restore epoch
   * ([[IndexLifecycle.markRestored]], written BEFORE the pointer flip so
   * a crash between the two fails safe — a spurious refusal, never a
   * silent double-append), and [[IndexLifecycle.appendOnce]] REFUSES any
   * run whose marker predates the restore with the fresh-checkpoint
   * instruction. The manifest additionally ships the SOURCE's marker
   * inventory (`runs=`/`run=` lines — run identity, not batch progress),
   * so the import can block exactly the runs whose appends the bundled
   * data already contains, even at batchId 0 (where a redelivery and a
   * fresh start are indistinguishable by batchId); a legacy manifest
   * without the inventory falls back to refusing markerless runs that
   * resume mid-stream (batchId > 0).
   */
  def importBundle(spark: SparkSession, bundlePath: String,
                   targetRoot: String, overwrite: Boolean = false): BundleInfo = {
    val bf = fsFor(spark, bundlePath)
    val mp = new Path(s"$bundlePath/$ManifestName")
    if (!bf.exists(mp)) throw new IllegalStateException(
      s"$bundlePath has no $ManifestName — torn or foreign bundle " +
        "(the manifest is written last; its absence means the export " +
        "never completed)")
    val in = bf.open(mp)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    require(lines.headOption.contains(Header),
      s"$bundlePath manifest is not a ${Header} manifest")
    def field(k: String): String = lines
      .collectFirst { case l if l.startsWith(s"$k=") => l.stripPrefix(s"$k=") }
      .getOrElse(throw new IllegalStateException(
        s"manifest missing required field '$k'"))
    val pname = field("pointer")
    require(PointerNames.contains(pname), s"unknown pointer family '$pname'")
    val current = field("current").toLong
    val versions = lines.filter(_.startsWith("version="))
      .map(_.stripPrefix("version=").toLong)
    val files = lines.filter(_.startsWith("file\t")).map { l =>
      l.split('\t') match {
        case Array(_, p, n) => (p, n.toLong)
        case _ => throw new IllegalStateException(s"malformed manifest line: $l")
      }
    }
    require(versions.nonEmpty && versions.contains(current),
      "manifest names no versions or a current outside them")
    // verify the inventory against the medium BEFORE touching the target
    val declared = versions.toSet
    files.foreach { case (relp, len) =>
      val p = new Path(s"$bundlePath/$relp")
      if (!bf.exists(p)) throw new IllegalStateException(
        s"torn bundle: $relp listed in the manifest but missing")
      val got = bf.getFileStatus(p).getLen
      if (got != len) throw new IllegalStateException(
        s"torn bundle: $relp is $got bytes, manifest says $len")
      // a file under an undeclared version would otherwise surface as a
      // bare NoSuchElementException from the remap — give it the same
      // torn/foreign diagnostics as every other malformed-manifest path
      val slash = relp.indexOf('/')
      if (slash <= 0 || !relp.startsWith("v=") ||
          relp.substring(2, slash).toLongOption.forall(!declared.contains(_)))
        throw new IllegalStateException(
          s"torn bundle: $relp is outside the manifest's declared " +
            s"version set ${versions.sorted.mkString("[", ",", "]")}")
    }
    val tf = fsFor(spark, targetRoot)
    val existingPtr = pointer(spark, targetRoot)
    val existingVersions = listVersions(tf, targetRoot)
    val live = existingPtr.nonEmpty || existingVersions.nonEmpty
    // a LEGACY FLAT artifact (tables directly under the root, no pointer,
    // no v= dirs) is not importable-onto at all: dropping a v=1 + pointer
    // beside its tables would silently re-route every resolveDir reader
    // to the bundle's data with no consent path — the overwrite flag only
    // covers CAS-versioned targets, whose old versions stay readable
    if (!live && tf.exists(new Path(targetRoot)) &&
        tf.listStatus(new Path(targetRoot)).nonEmpty)
      throw new IllegalArgumentException(
        s"$targetRoot holds a legacy flat (unversioned) artifact — " +
          "importing beside it would hijack its readers; rebuild it under " +
          "the CAS layout first, or import to a fresh root")
    if (live && !overwrite) throw new IllegalArgumentException(
      s"$targetRoot already holds a versioned artifact — pass " +
        "overwrite=true to import on top (existing versions stay " +
        "readable until vacuum)")
    // a torn append pending on the LIVE target must resolve BEFORE the
    // import: its partial files sit in the current version dir, and once
    // the pointer flips to the imported version, abandonTornAppends
    // resolves against the NEW dir — it would sweep the intent manifest
    // while leaving the partial files in the old version, where a later
    // pointer rollback would serve them as live data with no record left
    if (live) {
      val torn = IndexLifecycle.pendingIntents(spark, targetRoot)
      require(torn.isEmpty,
        s"$targetRoot has ${torn.size} torn append(s) pending " +
          s"(${torn.mkString(", ")}) — resolve before importing on top " +
          "(replay the batch to self-heal, or " +
          "IndexLifecycle.abandonTornAppends) so the rollback path never " +
          "serves the partial files")
    }
    existingPtr.foreach { case (n, _) => require(n == pname,
      s"pointer family mismatch: bundle is $pname, target uses $n — " +
        "refusing to mix artifact families") }
    // fresh target keeps the bundled numbers; a live one renumbers after
    // its newest so history stays monotone
    val base: Long =
      if (!live) 0L
      else math.max(existingPtr.map(_._2).getOrElse(0L),
        existingVersions.maxOption.getOrElse(0L))
    val remap: Map[Long, Long] =
      if (!live) versions.map(v => v -> v).toMap
      else versions.sorted.zipWithIndex.map { case (v, i) =>
        v -> (base + i + 1)
      }.toMap
    def remapPath(p: String): String = {
      val slash = p.indexOf('/')
      require(slash > 0 && p.startsWith("v="),
        s"bundle file outside a version dir: $p")
      val v = p.substring(2, slash).toLong
      s"v=${remap(v)}${p.substring(slash)}"
    }
    // a copy failure leaves partial v= dirs that would reclassify a fresh
    // target as LIVE (forcing overwrite=true + renumbering on the retry);
    // the remapped version numbers are new by construction — fresh target
    // had none, live target renumbers past its max — so the debris dirs
    // are entirely this import's to best-effort remove (the pointer flips
    // last, so no reader ever saw them)
    try copyFiles(bf, bf.makeQualified(new Path(bundlePath)).toString,
      tf, targetRoot, files.map { case (p, _) => (p, remapPath(p)) })
    catch {
      case scala.util.control.NonFatal(e) =>
        remap.values.foreach { v =>
          try tf.delete(new Path(s"$targetRoot/v=$v"), true)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        throw e
    }
    // restore sentinel BEFORE the flip: once the imported data can be
    // seen, the epoch fence is already up (a crash between the two leaves
    // a bumped epoch over unchanged data — a loud spurious refusal for
    // the maintaining stream, which is the safe direction; the reverse
    // order would leave restored data an old checkpoint could silently
    // double-append into). Blocked runs = the bundle's shipped inventory
    // plus the target's own pre-import markers; completeness holds only
    // when the bundle recorded its source's runs (post-r16 manifests).
    val bundleRuns = lines.filter(_.startsWith("run="))
      .map(_.stripPrefix("run="))
    val runsComplete = lines.exists(_.trim == "runs=complete")
    val targetRuns = IndexLifecycle.runMarkers(spark, targetRoot)
      .map(_._2).filter(_.nonEmpty)
    IndexLifecycle.markRestored(spark, targetRoot, s"bundle=$bundlePath",
      oldRunsComplete = runsComplete, oldRuns = bundleRuns ++ targetRuns)
    // flip LAST — the import becomes visible atomically or not at all
    // (IndexLifecycle's atomic write-temp + rename + stale-tmp sweep, so a
    // crashed earlier import's pointer debris is also cleaned here)
    IndexLifecycle.flipPointerAt(spark, targetRoot, pname, remap(current))
    BundleInfo(pname, remap(current), versions.map(remap).sorted,
      files.size, files.map(_._2).sum)
  }

  /**
   * OFFLINE bundle integrity check — the operator-side mirror of
   * [[importBundle]]'s refusal battery, runnable BEFORE shipping a bundle
   * offsite (a DR backup whose unrestorability is discovered during the
   * disaster was verified never). Every defect is REPORTED as a row, not
   * thrown — the whole point is a complete damage inventory:
   *
   *   (check, ok, detail) rows for: manifest presence and header, pointer
   *   family, version declarations (non-empty, current within them),
   *   run-inventory presence + completeness (a pre-r16 bundle without one
   *   restores under the weaker mid-stream heuristic — worth knowing
   *   before it ships), per-file presence, per-file byte counts, files
   *   escaping the declared version set, and files on the medium the
   *   manifest never listed (a partial second export, foreign debris).
   *
   * A clean bundle yields all-ok rows. Nothing on the bundle or any
   * target is modified; the check reads the manifest plus one file
   * listing (statuses only — no data bytes move).
   */
  def verifyBundle(spark: SparkSession, bundlePath: String)
      : org.apache.spark.sql.DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer[(String, Boolean, String)]()
    def check(name: String, ok: Boolean, detail: String): Unit =
      rows += ((name, ok, detail))
    val bf = fsFor(spark, bundlePath)
    val mp = new Path(s"$bundlePath/$ManifestName")
    val manifestLines: Option[Vector[String]] =
      if (!bf.exists(mp)) None
      else scala.util.Try {
        val in = bf.open(mp)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      }.toOption
    manifestLines match {
      case None =>
        check("manifest", ok = false,
          s"no readable $ManifestName — torn or foreign bundle (the " +
            "manifest is written last; its absence means the export never " +
            "completed)")
      case Some(lines) =>
        check("manifest", ok = true, s"${lines.size} lines")
        check("header", lines.headOption.contains(Header),
          lines.headOption.getOrElse("<empty>"))
        val pname = lines.collectFirst {
          case l if l.startsWith("pointer=") => l.stripPrefix("pointer=") }
        check("pointer-family",
          pname.exists(PointerNames.contains),
          pname.getOrElse("<missing>"))
        val current = lines.collectFirst {
          case l if l.startsWith("current=") => l.stripPrefix("current=") }
          .flatMap(_.toLongOption)
        val versions = lines.filter(_.startsWith("version="))
          .flatMap(_.stripPrefix("version=").toLongOption)
        check("versions",
          versions.nonEmpty && current.exists(versions.contains),
          s"declared=${versions.sorted.mkString(",")} " +
            s"current=${current.map(_.toString).getOrElse("<missing>")}")
        val hasInventory = lines.exists(_.startsWith("runs="))
        val complete = lines.exists(_.trim == "runs=complete")
        check("run-inventory", hasInventory,
          if (!hasInventory)
            "pre-r16 manifest: no run inventory — a restore keeps only " +
              "the mid-stream heuristic; re-export from the source to " +
              "ship the blocked-run set"
          else if (complete)
            s"complete (${lines.count(_.startsWith("run="))} runs)"
          else s"INCOMPLETE (${lines.count(_.startsWith("run="))} runs " +
            "recorded — the source had unreadable or runId-less markers)")
        val files = lines.filter(_.startsWith("file\t")).flatMap { l =>
          l.split('\t') match {
            case Array(_, p, n) => n.toLongOption.map(p -> _)
            case _ => check("manifest-line", ok = false,
              s"malformed: $l"); None
          }
        }
        check("file-count", files.nonEmpty, s"${files.size} listed")
        val declared = versions.toSet
        var missing = 0; var sizeBad = 0; var escaped = 0
        files.foreach { case (relp, len) =>
          val p = new Path(s"$bundlePath/$relp")
          val st = scala.util.Try(bf.getFileStatus(p)).toOption
          if (st.isEmpty) { missing += 1
            check("file-missing", ok = false, relp)
          } else if (st.get.getLen != len) { sizeBad += 1
            check("file-size", ok = false,
              s"$relp is ${st.get.getLen} bytes, manifest says $len " +
                "(truncated or corrupt transfer)")
          }
          val slash = relp.indexOf('/')
          if (slash <= 0 || !relp.startsWith("v=") ||
              relp.substring(2, slash).toLongOption
                .forall(!declared.contains(_))) { escaped += 1
            check("file-version", ok = false,
              s"$relp is outside the declared version set")
          }
        }
        if (missing == 0) check("files-present", ok = true,
          s"all ${files.size} listed files exist")
        if (sizeBad == 0) check("file-sizes", ok = true,
          "all byte counts match the manifest")
        if (escaped == 0) check("file-versions", ok = true,
          "every file is inside a declared version")
        // files the manifest never listed: a racing second export, a
        // partial retry, foreign debris — not fatal (import ignores
        // them), but a write-once medium should hold exactly the export
        val listed = files.map(_._1).toSet
        val rootQ = bf.makeQualified(new Path(bundlePath)).toString
        val onMedium = scala.util.Try {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          val it = bf.listFiles(new Path(bundlePath), true)
          while (it.hasNext) out += it.next().getPath.toString
            .stripPrefix(rootQ + "/")
          out.toSeq
        }.getOrElse(Nil).filterNot(_ == ManifestName)
        val unlisted = onMedium.filterNot(listed.contains)
        check("unlisted-files", unlisted.isEmpty,
          if (unlisted.isEmpty) "medium holds exactly the manifest's files"
          else s"${unlisted.size} file(s) on the medium the manifest " +
            s"never listed (e.g. ${unlisted.head})")
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.toSeq.map { case (c, ok, d) =>
        org.apache.spark.sql.Row(c, ok, d) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("check",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("ok",
          org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("detail",
          org.apache.spark.sql.types.StringType, nullable = false))))
  }
}
