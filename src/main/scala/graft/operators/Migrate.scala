package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * V1 → V2 storage-format migration — the reference's `hydraidectl migrate
 * v1-to-v2` tool (reference: app/hydraidectl/cmd/migrate_v1_to_v2.go:19-245
 * — CLI contract: dry-run / verify / delete-old / migration lock file;
 * app/core/hydra/swamp/chronicler/v2/migrator/migrator.go:34-70 — Config and
 * Result counters: raw entries, duplicate keys removed, empty swamps
 * skipped, old/new byte sizes, per-swamp failure with its phase) re-expressed
 * as a Spark batch job.
 *
 * Format mapping. The reference migrates multi-file GOB chunk logs (V1) into
 * a single-file append-only chronicle (V2). This engine's V1 analogue is the
 * legacy ingest layout: an append-only command-log parquet per swamp with an
 * OPAQUE GOB body column — `(key, seq, op, body)`. Its V2 is the
 * engine-native layout: the LWW-compacted state with the body decoded into
 * typed, prunable columns, committed as a versioned CAS snapshot
 * ([[Snapshots.commit]]) so readers never observe a half-migrated swamp.
 * Migration per swamp = load → convert (LWW replay + GOB decode) → write →
 * verify, with the failing phase recorded exactly as the reference does.
 *
 * Scale shape: the swamp LIST is metadata-sized (driver enumerates
 * directories); each swamp's migration is a fully distributed job (one
 * key-partitioned LWW shuffle + scan-stage decode — the [[Chronicle]] plan).
 * `Config.parallel` driver threads overlap the per-swamp jobs so small
 * swamps don't serialize on scheduling, mirroring the reference's worker
 * pool (migrator.go:96 `Parallel`), while Spark arbitrates executor slots
 * globally. Verification is distributed too: a symmetric `exceptAll` between
 * the committed snapshot and the computed state — never a driver collect.
 */
object Migrate {

  /** Mirrors the reference migrator's Config (migrator.go:34-43). */
  final case class Config(
      dryRun: Boolean = false,
      verify: Boolean = true,
      deleteOld: Boolean = false,
      stopOnError: Boolean = false,
      parallel: Int = 4)

  /** One swamp's outcome; `phase` ∈ load/convert/write/verify like the
    * reference's FailedSwamp (migrator.go:64-69), or "done"/"skipped". */
  final case class SwampResult(
      swamp: String,
      ok: Boolean,
      phase: String,
      rawEntries: Long,
      entries: Long,
      duplicateKeys: Long,
      tombstonedKeys: Long,
      skippedEmpty: Boolean,
      oldBytes: Long,
      newBytes: Long,
      error: Option[String])

  /** Whole-run result — the reference's Result counters (migrator.go:45-61). */
  final case class Report(
      totalSwamps: Long,
      successfulSwamps: Long,
      failedSwamps: Long,
      emptySwampsSkipped: Long,
      totalRawEntries: Long,
      totalEntries: Long,
      duplicateKeys: Long,
      oldSizeBytes: Long,
      newSizeBytes: Long,
      dryRun: Boolean,
      perSwamp: Seq[SwampResult])

  private val LockName = ".migration-lock"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirBytes(f: FileSystem, p: Path): Long =
    if (f.exists(p)) f.getContentSummary(p).getLength else 0L

  /**
   * Migrate every V1 swamp directory under `srcRoot` to a V2 snapshot table
   * under `dstRoot/<swamp>`. `bodySchema` is the struct the GOB bodies
   * decode to (the reference knows it from the registered model type; here
   * the caller declares it, same as [[graft.functions.Gob.unpack]]).
   *
   * Lock discipline (migrate_v1_to_v2.go:17,121-131): a `.migration-lock`
   * file under `dstRoot` is created atomically before any write and removed
   * afterwards; a pre-existing lock aborts the run. Dry-run takes no lock —
   * it writes nothing, so there is nothing to protect.
   *
   * A corrupt GOB body decodes to NULL ([[graft.functions.Gob]]'s hostile-
   * input contract); a swamp containing any non-null body that decodes NULL
   * fails in phase "convert" — migrating it would silently drop user data,
   * the one thing a migration must never do. Other swamps continue unless
   * `stopOnError` (reference StopOnError, migrator.go:41).
   */
  def v1ToV2(spark: SparkSession, srcRoot: String, dstRoot: String,
             bodySchema: StructType, cfg: Config = Config()): Report = {
    val srcFs = fs(spark, srcRoot)
    val swamps = srcFs.listStatus(new Path(srcRoot)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).sorted

    val dstFs = fs(spark, dstRoot)
    val lock = new Path(s"$dstRoot/$LockName")
    if (!cfg.dryRun) {
      dstFs.mkdirs(new Path(dstRoot))
      // Acquire the lock via an ATOMIC create. On HDFS-like filesystems
      // create(path, overwrite=false) arbitrates atomically; but
      // RawLocalFileSystem implements it as exists-then-create, so two
      // racing local migrators could both pass — on file:// the arbiter
      // is java.io.File.createNewFile (POSIX O_CREAT|O_EXCL). Local-ness
      // is decided by the RESOLVED FileSystem type, NOT the URI scheme: a
      // scheme-less path resolves against fs.defaultFS, which on a
      // cluster is HDFS — the scheme==null branch would then create the
      // "lock" on the driver's local disk (arbitrating nothing across
      // hosts) while the finally deletes the nonexistent HDFS path and
      // leaves the local debris blocking every rerun from that host.
      val isLocalFs =
        dstFs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
          dstFs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
      val acquired =
        if (isLocalFs)
          new java.io.File(dstFs.makeQualified(lock).toUri.getPath)
            .createNewFile()
        else
          try { dstFs.create(lock, false).close(); true }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                 _: java.io.IOException if dstFs.exists(lock) => false
          }
      if (!acquired)
        throw new IllegalStateException(
          s"migration already in progress (lock file exists: $lock) — " +
            "if no migration is running, delete the lock file manually")
    }

    try {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, cfg.parallel))
      val futures = swamps.map { name =>
        pool.submit(new java.util.concurrent.Callable[SwampResult] {
          def call(): SwampResult =
            // distinct phase: a stop-on-error skip never touched the source
            // — reporting it as a "load" failure would send an operator
            // hunting for file corruption that does not exist
            if (stop.get()) SwampResult(name, ok = false, phase = "skipped", 0, 0, 0, 0,
              skippedEmpty = false, 0, 0, Some("skipped: stop-on-error tripped"))
            else {
              val r = migrateOne(spark, s"$srcRoot/$name", s"$dstRoot/$name", name,
                bodySchema, cfg)
              if (!r.ok && cfg.stopOnError) stop.set(true)
              r
            }
        })
      }
      pool.shutdown()
      val results = futures.map(_.get())

      Report(
        totalSwamps = results.size.toLong,
        successfulSwamps = results.count(r => r.ok && !r.skippedEmpty).toLong,
        failedSwamps = results.count(!_.ok).toLong,
        emptySwampsSkipped = results.count(_.skippedEmpty).toLong,
        totalRawEntries = results.map(_.rawEntries).sum,
        totalEntries = results.map(_.entries).sum,
        duplicateKeys = results.map(_.duplicateKeys).sum,
        oldSizeBytes = results.map(_.oldBytes).sum,
        newSizeBytes = results.map(_.newBytes).sum,
        dryRun = cfg.dryRun,
        perSwamp = results)
    } finally {
      if (!cfg.dryRun) dstFs.delete(lock, false)
    }
  }

  /** One swamp: load → convert → write → verify. Never throws for a
    * data-shaped failure — the phase + error land in the result row. */
  private def migrateOne(spark: SparkSession, src: String, dst: String,
                         name: String, bodySchema: StructType,
                         cfg: Config): SwampResult = {
    val srcFs = fs(spark, src)
    val oldBytes = dirBytes(srcFs, new Path(src))

    // ---- load -----------------------------------------------------------
    val (log, rawEntries, uniqueKeys) =
      try {
        val df = spark.read.parquet(src)
        val agg = df.agg(count(lit(1)), count_distinct(col("key"))).head()
        (df, agg.getLong(0), agg.getLong(1))
      } catch {
        case e: Exception =>
          return SwampResult(name, ok = false, phase = "load", 0, 0, 0, 0,
            skippedEmpty = false, oldBytes, 0, Some(e.getMessage))
      }

    // ---- convert: LWW replay + GOB → native columns ---------------------
    try {
      // materialize the decoded LWW state ONCE: the corrupt check, the
      // entries count, the snapshot write, and both verify legs would
      // otherwise each re-run the key window + GOB decode from source
      // (~5x the dominant cost per swamp). localCheckpoint, not a tracked
      // cache: a thousand-swamp run through CacheRegistry would
      // accumulate a thousand cached states with no per-swamp release.
      val lww = Chronicle.lastWriteWins(log, "key", "seq", "op")
        .withColumn("_b", graft.functions.Gob.unpack(col("body"), bodySchema))
        .localCheckpoint()
      // decode integrity BEFORE dropping the opaque body: a surviving row
      // whose body was present but decoded NULL is corruption, and writing
      // it would silently lose the user's data (the migration cardinal sin)
      val corrupt = lww
        .filter(col("body").isNotNull && col("_b").isNull)
        .limit(1).count()
      if (corrupt > 0)
        return SwampResult(name, ok = false, phase = "convert", rawEntries,
          0, rawEntries - uniqueKeys, 0, skippedEmpty = false, oldBytes, 0,
          Some("GOB body failed to decode against the declared schema"))

      val native = lww.select((col("key") +:
        bodySchema.fieldNames.toSeq.map(f => col(s"_b.$f").as(f))): _*)
      val entries = native.count()
      val tombstoned = uniqueKeys - entries
      val duplicateKeys = rawEntries - uniqueKeys

      // ---- empty swamp: nothing to write (migrator.go:56 EmptySwampsSkipped)
      if (entries == 0)
        return SwampResult(name, ok = true, phase = "skipped", rawEntries, 0,
          duplicateKeys, tombstoned, skippedEmpty = true, oldBytes, 0, None)

      if (cfg.dryRun)
        return SwampResult(name, ok = true, phase = "done", rawEntries, entries,
          duplicateKeys, tombstoned, skippedEmpty = false, oldBytes, 0, None)

      // ---- write: one atomic CAS snapshot — readers see V1-complete or
      // V2-complete, never a torn swamp
      try Snapshots.commit(native, dst, meta = Map("migrated_from" -> src))
      catch {
        case e: Exception =>
          return SwampResult(name, ok = false, phase = "write", rawEntries,
            entries, duplicateKeys, tombstoned, skippedEmpty = false,
            oldBytes, 0, Some(e.getMessage))
      }
      // telemetry only, and the snapshot is already COMMITTED: a transient
      // FS error here must not bubble to the outer handler, which would
      // report phase="convert"/entries=0 for a swamp whose V2 data is
      // live — an operator (or retry policy) would hunt for decode
      // corruption that does not exist
      val newBytes =
        try dirBytes(fs(spark, dst), new Path(dst))
        catch { case _: Exception => 0L }

      // ---- verify: distributed symmetric difference (not just a count —
      // a count match with swapped rows would pass; exceptAll will not)
      if (cfg.verify) {
        val failure =
          try {
            val back = Snapshots.read(spark, dst)
            val diff = back.exceptAll(native).limit(1).count() +
              native.exceptAll(back).limit(1).count()
            if (diff > 0) Some("committed snapshot differs from computed state")
            else None
          } catch {
            // a throw DURING verification is still a verify-phase failure —
            // the outer handler would mislabel it "convert"
            case e: Exception => Some(e.getMessage)
          }
        if (failure.isDefined)
          return SwampResult(name, ok = false, phase = "verify", rawEntries,
            entries, duplicateKeys, tombstoned, skippedEmpty = false,
            oldBytes, newBytes, failure)
      }

      // cleanup failure must not fail a completed migration (the V2 data
      // is committed and verified; stale V1 files are an ops follow-up)
      if (cfg.deleteOld)
        try srcFs.delete(new Path(src), true)
        catch { case _: Exception => () }

      SwampResult(name, ok = true, phase = "done", rawEntries, entries,
        duplicateKeys, tombstoned, skippedEmpty = false, oldBytes, newBytes, None)
    } catch {
      case e: Exception =>
        SwampResult(name, ok = false, phase = "convert", rawEntries, 0,
          rawEntries - uniqueKeys, 0, skippedEmpty = false, oldBytes, 0,
          Some(e.getMessage))
    }
  }

  /** The run report as a DataFrame — the engine's answer to the reference's
    * `--json` output (migrate_v1_to_v2.go:63): queryable, joinable ops data. */
  def reportDf(spark: SparkSession, r: Report): DataFrame = {
    import spark.implicits._
    r.perSwamp.toDS().toDF()
  }

  // =========================================================================
  // Legacy serving-artifact migration — the operator-side sweep that ends
  // the documented pre-stamp ambiguities ([[IndexLifecycle.auditArtifacts]]
  // legacy_flags). Each migration rebuilds the flagged tables under a NEW
  // CAS version with the width stamps / denormalized columns current builds
  // write, flips the pointer last, and leaves the old version readable for
  // rollback (vacuum when validated). After migration the append-side
  // `allowUnverifiedWidth` escape hatch is unnecessary: every width is
  // machine-verified again.
  // =========================================================================

  /** One artifact's migration outcome. `actions` narrates exactly what was
    * rebuilt/stamped and from which evidence (declared vs inferred). */
  final case class ArtifactMigration(
      artifact: String, kind: String,
      fromVersion: Option[Long], toVersion: Option[Long],
      actions: Seq[String])

  /**
   * Rebuild a legacy serving artifact into its fully-stamped modern form,
   * in place (new CAS version + pointer flip — concurrent readers keep the
   * old version; roll back by re-flipping the pointer):
   *
   *  - signature table, legacy STRING shingle sets: `_sh` is re-hashed to
   *    the 32-bit int form ([[graft.functions.TextFunctions.hash32]] —
   *    bit-identical to what a fresh build writes), `_sig` is recomputed
   *    from the hashed sets (identical values by construction), and `_sn`
   *    is stamped — INFERRED from the stored shingle strings (an n-gram
   *    shingle is n space-joined tokens) and cross-checked against
   *    `declaredShingleN` when given.
   *  - signature table, pre-`_sn` hashed sets: the width is NOT recoverable
   *    from hashes — `declaredShingleN` is REQUIRED (confirm the original
   *    build parameter out-of-band) and stamped.
   *  - shingle postings, pre-`_sn`: same rule; `declaredShingleN` required,
   *    stamped as the `_sn` constant.
   *  - gram index, pre-`_gk`: `declaredGramK` required, stamped.
   *  - text index, pre-`dl` postings and/or missing `terms/` dictionary:
   *    postings are rewritten with the doc length denormalized in (joined
   *    from the `lengths/` table when present, else derived as Σtf per
   *    key — identical by the tokenizer's definition of dl), re-clustered
   *    by term (the build layout), and the `terms/` dictionary is
   *    materialized. `lengths/` and `stats/` are carried into the new
   *    version unchanged (versions are self-contained).
   *
   * An artifact with NO legacy flags is a no-op (reported, not an error);
   * an `unknown` kind with flags refuses. Torn replay-safe appends must be
   * resolved first ([[IndexLifecycle.nextVersion]] refuses while intents
   * are pending — the compaction rule, same reason).
   */
  def migrateArtifact(spark: SparkSession, root: String,
                      declaredShingleN: Option[Int] = None,
                      declaredGramK: Option[Int] = None): ArtifactMigration = {
    val dir = IndexLifecycle.resolveDir(spark, root)
    val (kind, flags) = IndexLifecycle.detectKind(spark, dir)
    val from = IndexLifecycle.currentVersion(spark, root)
    if (flags.isEmpty)
      return ArtifactMigration(root, kind, from, from,
        Seq("no legacy flags — already current, nothing to migrate"))
    val next = IndexLifecycle.nextVersion(spark, root)
    val vdir = s"$root/v=$next"
    val actions = scala.collection.mutable.ArrayBuffer[String]()
    kind match {
      case "signature-table" =>
        val base = spark.read.parquet(dir)
        val isStringSh = base.schema("_sh").dataType match {
          case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType, _) => true
          case _ => false
        }
        val shN: Int =
          if (isStringSh) {
            // a shingle string is n space-joined tokens; docs SHORTER than
            // n produce one under-width shingle, so the corpus-wide MAX is
            // the build width (exact unless every document was shorter
            // than n — in which case the declared value must carry it)
            val inferred = base.select(explode(col("_sh")).as("_s"))
              .agg(max(size(split(col("_s"), " "))).as("n"))
              .head(1).headOption.flatMap(r => Option(r.get(0)))
              .map(_.asInstanceOf[Int])
            // the extra full-table scan runs lazily — only when the
            // declaration disagrees with the inferred width, or when
            // inference must prove its own evidence is conclusive
            lazy val maxSetSize = base.agg(max(size(col("_sh"))).as("m"))
              .head(1).headOption.flatMap(r => Option(r.get(0)))
              .map(_.asInstanceOf[Int]).getOrElse(0)
            (declaredShingleN, inferred) match {
              case (Some(d), Some(i)) =>
                // i is EXACT evidence of the build width whenever any doc
                // produced more than one shingle (t tokens ≥ n ⇒ n-token
                // shingles); d may only exceed i when EVERY doc was
                // shorter than n, i.e. every stored set is a single
                // under-width shingle. Trusting a larger declaration over
                // contradicting evidence would stamp a lie the width
                // guards then enforce.
                require(i == d || (i < d && maxSetSize <= 1),
                  s"declaredShingleN=$d contradicts the stored shingle " +
                    s"strings: documents produced multiple $i-token " +
                    s"shingles, which only a shingleN=$i build does — " +
                    "fix the declaration (or drop it; the width is " +
                    "inferable here)")
                actions += s"shingleN=$d declared, consistent with stored " +
                  s"shingle strings (max $i tokens)"
                d
              case (None, Some(i)) =>
                // inference is only EVIDENCE when some document produced
                // multiple shingles; an all-under-width corpus (every set
                // a single shingle) would silently stamp an undershooting
                // width — refuse and demand the confirmed parameter
                require(maxSetSize > 1,
                  s"$root width evidence is inconclusive: every stored " +
                    s"shingle set is a single (possibly under-width) " +
                    s"shingle, so the inferred $i may undershoot the " +
                    "build width — pass declaredShingleN after confirming " +
                    "the original build parameter out-of-band")
                actions += s"shingleN=$i inferred from stored shingle strings"
                i
              case (Some(d), None) =>
                actions += s"shingleN=$d declared (empty table, nothing to infer)"
                d
              case (None, None) => throw new IllegalArgumentException(
                s"$root is empty and pre-_sn — pass declaredShingleN")
            }
          } else declaredShingleN.getOrElse(throw new IllegalArgumentException(
            s"$root stores HASHED shingle sets without an _sn stamp — the " +
              "shingle width is not recoverable from hashes; pass " +
              "declaredShingleN after confirming the original build " +
              "parameter out-of-band"))
        val rehashed =
          if (isStringSh) {
            val numHashes = base.select(size(col("_sig")).as("k"))
              .head(1).headOption.map(_.getInt(0)).getOrElse(16)
            actions += "string shingle sets re-hashed to int32 form; " +
              s"signatures recomputed ($numHashes hashes, identical values " +
              "by construction)"
            base
              .withColumn("_sh", array_distinct(transform(col("_sh"),
                s => graft.functions.TextFunctions.hash32(s))))
              .withColumn("_sig", graft.functions.TextFunctions
                .minhashSignatureFromHashes(col("_sh"), numHashes))
          } else {
            if (!isStringSh) actions += "hashed sets kept as stored"
            base
          }
        actions += s"_sn=$shN stamped"
        rehashed.withColumn("_sn", lit(shN))
          .write.mode("overwrite").parquet(vdir)

      case "shingle-postings" =>
        val n = declaredShingleN.getOrElse(throw new IllegalArgumentException(
          s"$root shingle postings are pre-_sn — the width is not " +
            "recoverable from hashes; pass declaredShingleN"))
        actions += s"_sn=$n stamped onto the postings"
        spark.read.parquet(dir).withColumn("_sn", lit(n))
          .write.mode("overwrite").parquet(vdir)

      case "gram-index" =>
        val k = declaredGramK.getOrElse(throw new IllegalArgumentException(
          s"$root gram index is pre-_gk — the gram width is not " +
            "recoverable from hashes; pass declaredGramK"))
        actions += s"_gk=$k stamped onto the gram rows"
        spark.read.parquet(dir).withColumn("_gk", lit(k))
          .write.mode("overwrite").parquet(vdir)

      case "text-index" =>
        val postings = spark.read.parquet(s"$dir/postings")
        val hasLengths = IndexLifecycle.tableExists(spark, s"$dir/lengths")
        val keyCol = postings.columns
          .filterNot(Set("term", "tf", "dl").contains) match {
          case Array(k) => k
          case other => throw new IllegalStateException(
            s"$root postings carry ambiguous key columns: ${other.mkString(",")}")
        }
        // Σtf per key IS dl by the tokenizer's definition (every token is
        // indexed) — always computed as the fallback so a lengths/ table
        // missing some keys (exactly the unhygienic population this sweep
        // targets) cannot silently DROP their postings rows through an
        // inner join: unmatched keys fall back to the derived length
        val derived = postings.groupBy(col(keyCol))
          .agg(sum(col("tf")).as("_dl_derived"))
        val withDl =
          if (postings.columns.contains("dl")) {
            actions += "postings already carry dl"
            postings
          } else if (hasLengths) {
            actions += "dl denormalized into postings from lengths/ " +
              "(keys missing there fall back to the derived sum(tf))"
            postings
              .join(spark.read.parquet(s"$dir/lengths"), Seq(keyCol), "left")
              .join(derived, Seq(keyCol))
              .withColumn("dl", coalesce(col("dl"), col("_dl_derived")))
              .drop("_dl_derived")
          } else {
            actions += "dl derived as sum(tf) per doc (no lengths/ table)"
            postings.join(derived, Seq(keyCol))
              .withColumnRenamed("_dl_derived", "dl")
          }
        withDl.repartitionByRange(col("term"))
          .sortWithinPartitions(col("term"))
          .write.mode("overwrite").parquet(s"$vdir/postings")
        if (hasLengths)
          spark.read.parquet(s"$dir/lengths")
            .write.mode("overwrite").parquet(s"$vdir/lengths")
        if (IndexLifecycle.tableExists(spark, s"$dir/stats"))
          spark.read.parquet(s"$dir/stats")
            .write.mode("overwrite").parquet(s"$vdir/stats")
        TermStats.writeTermsTable(spark, vdir)
        actions += "terms/ dictionary materialized"

      case other => throw new IllegalArgumentException(
        s"$root: no migration path for kind '$other' with flags " +
          flags.mkString("[", "; ", "]"))
    }
    IndexLifecycle.flipPointer(spark, root, next)
    if (from.isEmpty)
      actions += "legacy flat tables left in place at the root (now " +
        "shadowed by the versioned layout); remove them after validating"
    ArtifactMigration(root, kind, from, Some(next), actions.toSeq)
  }

  /** [[migrateArtifact]] fleet-wide: every artifact under `root` that
    * [[IndexLifecycle.auditArtifacts]] flags, one report row each.
    * Artifacts whose migration needs a width the caller didn't supply are
    * REPORTED (kind + the refusal message), not thrown — a fleet sweep
    * must surface every blocker in one pass.
    *
    * A declared width is applied to AT MOST ONE artifact whose build it
    * cannot be cross-checked against (hashed pre-`_sn` signatures /
    * shingle postings for `declaredShingleN`, pre-`_gk` gram indexes for
    * `declaredGramK`): a heterogeneous fleet swept with one fleet-wide
    * width would get wrong widths certified on every other member —
    * exactly the lie the stamps exist to prevent. When several such
    * artifacts are flagged, each is reported for an individual
    * [[migrateArtifact]] call with its own confirmed width. String-
    * shingle tables never receive the fleet default at all: conclusive
    * evidence infers their width by itself, and inconclusive evidence
    * (empty / all-under-width sets) refuses inference — reported for an
    * individual call — rather than letting a fleet-wide number be
    * stamped where nothing can cross-check it. */
  def migrateFlagged(spark: SparkSession, root: String,
                     declaredShingleN: Option[Int] = None,
                     declaredGramK: Option[Int] = None): Seq[ArtifactMigration] = {
    import scala.jdk.CollectionConverters._
    // the audit already classified everything (kind + flags, Try-wrapped
    // per artifact so one corrupt member cannot kill the sweep) — drive
    // off ITS columns instead of re-probing footers per artifact, which
    // would both double the object-store I/O and reintroduce the
    // unguarded crash path auditOne exists to contain
    val classified = IndexLifecycle.auditArtifacts(spark, root)
      .select("artifact", "kind", "legacy_flags")
      .collectAsList().asScala.toSeq
      .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2)))
      .filter(_._3.nonEmpty)
    // the artifacts that would CONSUME a declared width with no
    // evidence to cross-check it against (string-shingle tables infer
    // and cross-check their own width — they never consume one)
    val shingleConsumers = classified.collect {
      case (a, k, fl)
        if (k == "signature-table" &&
            fl.exists(_.contains(IndexLifecycle.FlagPreSn)) &&
            !fl.exists(_.contains(IndexLifecycle.FlagStringShingles))) ||
           (k == "shingle-postings" &&
            fl.exists(_.contains(IndexLifecycle.FlagPreSn))) => a
    }
    val gramConsumers = classified.collect {
      case (a, k, fl)
        if k == "gram-index" &&
           fl.exists(_.contains(IndexLifecycle.FlagPreGk)) => a
    }
    val ambiguousShingle =
      declaredShingleN.nonEmpty && shingleConsumers.size > 1
    val ambiguousGram = declaredGramK.nonEmpty && gramConsumers.size > 1
    classified.map { case (a, k, fl) =>
      val ambiguous =
        (ambiguousShingle && shingleConsumers.contains(a)) ||
          (ambiguousGram && gramConsumers.contains(a))
      // string-shingle tables never receive the fleet default: with
      // conclusive evidence they infer their own width (a wrong fleet
      // default must not refuse them), and with INCONCLUSIVE evidence
      // (empty / all-under-width sets) migrateArtifact now refuses
      // inference outright — a fleet default reaching such a table
      // would be stamped with nothing able to cross-check it, the same
      // lie the ambiguity refusal exists to prevent
      val stringTable = k == "signature-table" &&
        fl.exists(_.contains(IndexLifecycle.FlagStringShingles))
      val shingleFor = if (stringTable) None else declaredShingleN
      if (ambiguous)
        ArtifactMigration(a, k, None, None, Seq(
          "refused: multiple flagged artifacts would receive the same " +
            "fleet-wide declared width, and their builds cannot be " +
            "cross-checked from hashes — run migrateArtifact on each " +
            "with its own confirmed width"))
      else scala.util.Try(
        migrateArtifact(spark, a, shingleFor, declaredGramK)) match {
        case scala.util.Success(m) => m
        case scala.util.Failure(e) =>
          ArtifactMigration(a, "unmigrated", None, None, Seq(
            s"refused: ${e.getMessage}" + (if (stringTable &&
              declaredShingleN.nonEmpty)
              " (the fleet-wide declaration is deliberately not applied " +
                "where no stored evidence can cross-check it — run " +
                "migrateArtifact on this artifact with its confirmed width)"
            else "")))
      }
    }
  }
}
