package graft.operators

import org.apache.hadoop.fs.{FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/**
 * Business-level advisory locks — the reference's `Lock`/`Unlock` RPC pair
 * (reference: proto/hydraide.proto:24-31,658-687; app/server/gateway/
 * gateway.go:66-126): a named lock independent of any table, acquired with
 * a TTL so a crashed client can never deadlock the system, blocking
 * callers queue until the holder releases or the TTL lapses.
 *
 * Spark re-expression: leases on the session's Hadoop FileSystem. A lock
 * is one file whose atomic exclusive `create` (no-overwrite) is the
 * mutual-exclusion primitive — the same primitive every Hadoop-compatible
 * store provides and the same idiom Snapshots uses for its pointer swap.
 * The lease file carries (lockId, expiresAt); an expired lease is stolen
 * by delete + re-create, where the atomic create again arbitrates racing
 * stealers. This is ADVISORY coordination for business logic, exactly as
 * in the reference — the engine's own write safety does not depend on it
 * (Snapshots.commitIf is the data-plane guard).
 */
object Locks {

  /** A held lease; pass it back to [[release]]/[[renew]]. */
  final case class Lease(name: String, lockId: String, expiresAtMs: Long)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fc(spark: SparkSession, p: Path) =
    org.apache.hadoop.fs.FileContext
      .getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)

  /** Lock names share one flat `_lock_` namespace with the steal tombs
    * (`.tomb.<uuid>`) and renew temps (`.tmp.<lockId>`), so a name that
    * could collide with those suffixes — or walk the path — is rejected
    * up front rather than silently aliasing another lock's files. */
  private def lockPath(dir: String, name: String) = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-'),
      s"lock name '$name' must be non-empty [A-Za-z0-9_-]")
    new Path(s"$dir/_lock_$name")
  }

  /** A torn or corrupt lease file (possible on filesystems whose exclusive
    * create is weaker than HDFS's, e.g. the local checksum FS under
    * concurrent writers) parses to this CLAIMABLE tombstone — it must be
    * stealable, or garbage would deadlock the lock name forever. */
  private def garbage(name: String) = Lease(name, "", 0L)

  private def readLease(f: FileSystem, p: Path, name: String): Option[Lease] =
    // no exists() pre-check: the FileNotFoundException branch already
    // covers a missing file, and the extra namenode RPC would run on
    // every poll of the acquire loop (it also re-opens the exists/open
    // TOCTOU window for no gain)
    try {
      val in = f.open(p)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      body.split(',') match {
        case Array(id, exp) =>
          scala.util.Try(exp.trim.toLong).toOption
            .map(Lease(name, id, _)).orElse(Some(garbage(name)))
        case _ => Some(garbage(name))
      }
    } catch {
      case _: java.io.FileNotFoundException => None // deleted under us
      case _: java.io.IOException => Some(garbage(name)) // corrupt: claimable
    }

  /** The current holder, if any (expired leases are reported too — they
    * are claimable, not cleared, until someone steals them). */
  def holder(spark: SparkSession, dir: String, name: String): Option[Lease] =
    readLease(fs(spark, dir), lockPath(dir, name), name)

  /**
   * One acquisition attempt. Returns the lease on success, None if the
   * lock is validly held by someone else. An expired lease is stolen:
   * delete + exclusive create, and the create arbitrates racing stealers.
   */
  def tryAcquire(spark: SparkSession, dir: String, name: String,
                 ttlMs: Long): Option[Lease] =
    tryAcquireImpl(spark, dir, name, ttlMs, () => ())

  /** [[tryAcquire]] with a race-injection point for the steal tests:
    * `beforeSteal` runs after the pre-steal re-read passes and before the
    * rename-away — the one window where a holder's renew can land. */
  private[graft] def tryAcquireImpl(spark: SparkSession, dir: String,
                                    name: String, ttlMs: Long,
                                    beforeSteal: () => Unit): Option[Lease] = {
    require(ttlMs > ExpiryMarginMs,
      s"ttlMs must exceed the ${ExpiryMarginMs}ms expiry margin — a shorter " +
        "lease could never be released or renewed (safelyHeld would always " +
        "refuse), so withLock would leak the lock file until the TTL lapsed")
    val f = fs(spark, dir)
    val p = lockPath(dir, name)
    val now = System.currentTimeMillis()
    readLease(f, p, name) match {
      case Some(l) if l.expiresAtMs > now => None // validly held
      case Some(stale) =>
        // Expired: STEAL via atomic rename-away, never a blind delete — a
        // blind delete could destroy a DIFFERENT (fresh, valid) lease
        // written between our read and our delete, yielding two confirmed
        // holders. The lease is RE-READ immediately before the rename (the
        // observation window shrinks from the whole read/verify path to
        // one read→rename step), rename arbitrates racing stealers, and
        // the mover verifies it moved the stale lease it observed. If a
        // fresh lease got moved despite the re-read, restore is attempted;
        // when even the restore loses (a third client re-created the lock
        // meanwhile), the tomb is LEFT IN PLACE — destroying it would
        // destroy the displaced holder's record. The displaced holder's
        // next renew()/release() reads the live file, sees a different
        // lockId, and learns it lost — the residual hazard window is one
        // filesystem round-trip wide, the minimum a content-CAS-free
        // filesystem can offer.
        if (!readLease(f, p, name).exists(l =>
          l.lockId == stale.lockId && l.expiresAtMs == stale.expiresAtMs))
          return None // changed under us: someone else acted
        beforeSteal()
        val tomb = new Path(s"$dir/_lock_$name.tomb.${java.util.UUID.randomUUID()}")
        try fc(spark, p).rename(p, tomb)
        catch { case _: java.io.IOException => return None } // lost steal race
        // verify WHAT we moved before the destructive branch, retrying
        // transient garbage reads (the create-confirm discipline): a single
        // IOException parsing as claimable garbage would otherwise route a
        // displaced FRESH lease into delete+create — two seated holders.
        // PERSISTENT garbage must still fall through and be claimed, or a
        // truly corrupt lease would deadlock the name forever (the
        // readLease scaladoc's contract); the retries narrow the transient
        // misread from one read to four over ~60ms, the best a
        // content-CAS-free filesystem offers.
        var moved = readLease(f, tomb, name)
        var tombRetries = 0
        while (moved.exists(_.lockId.isEmpty) && tombRetries < 3) {
          Thread.sleep(20L); tombRetries += 1
          moved = readLease(f, tomb, name)
        }
        moved match {
          case Some(m) if m.expiresAtMs > System.currentTimeMillis() =>
            // we moved someone's FRESH lease: put it back. ANY unexpired
            // tomb qualifies — the stale lease this steal decided on was
            // expired by construction, so a fresh one is a DIFFERENT
            // lease even when the lockId matches (the holder RENEWED
            // between the re-read and the rename: same id, new expiry;
            // a lockId-only guard would delete the renewed lease and
            // seat two holders — the disaster this branch exists to
            // prevent)
            try fc(spark, p).rename(tomb, p)
            catch { case _: java.io.IOException => () } // keep tomb: see above
            None
          case _ =>
            f.delete(tomb, false)
            create(f, p, name, ttlMs)
        }
      case None => create(f, p, name, ttlMs)
    }
  }

  private def create(f: FileSystem, p: Path, name: String,
                     ttlMs: Long): Option[Lease] = {
    val lease = Lease(name, java.util.UUID.randomUUID().toString,
      System.currentTimeMillis() + ttlMs)
    try {
      val out = f.create(p, false) // atomic exclusive create
      try out.write(s"${lease.lockId},${lease.expiresAtMs}".getBytes("UTF-8"))
      finally out.close()
      // confirm we are the recorded holder (paranoia for filesystems
      // whose exclusive-create guarantees are weaker than HDFS's). A
      // TRANSIENT read failure here must not abandon our own valid lease
      // file — returning None while the file holds our lease leaves the
      // lock ownerless for the whole TTL — so an unreadable/garbage
      // confirm is retried a few times before we give up. Persistent
      // garbage still returns None (safety over availability: claiming a
      // lease we cannot read back could seat two holders on a weak FS —
      // and garbage is claimable, so the name self-heals via a steal).
      // retry a MISSING read too, not just garbage: on the weak
      // filesystems this path targets, read-after-create can transiently
      // report not-found (or a racing stealer tombs and restores us within
      // the window) — giving up on one such read abandons our own valid
      // lease file and leaves the lock ownerless for the whole TTL
      var confirm = readLease(f, p, name)
      var retries = 0
      while ((confirm.isEmpty || confirm.exists(_.lockId.isEmpty)) &&
             retries < 3) {
        Thread.sleep(20L); retries += 1
        confirm = readLease(f, p, name)
      }
      confirm.filter(_.lockId == lease.lockId)
    } catch { case _: java.io.IOException => None } // lost the race
  }

  /** Blocking acquire, the reference's default: poll until granted or
    * `waitMs` elapses (the reference queues callers FIFO server-side; a
    * shared filesystem has no queue, so this is a fair-enough poll).
    * The default wait is genuinely blocking — waitMs = 0 would make the
    * "blocking" API behave exactly like [[tryAcquire]], contradicting
    * this contract; pass 0 explicitly for a single non-blocking attempt.
    *
    * COMPATIBILITY NOTE: before round 12 the default was waitMs = 0 (a
    * misnomer — "acquire" never blocked). A caller upgrading across that
    * change who wants the old semantics should call [[tryAcquire]] (the
    * non-blocking API, same return shape) or pass waitMs = 0 — relying
    * on the old default now blocks up to 10 s when contended. All
    * in-repo call sites pass waitMs explicitly (audited round 13). */
  def acquire(spark: SparkSession, dir: String, name: String,
              ttlMs: Long, waitMs: Long = 10000L, pollMs: Long = 50L): Option[Lease] = {
    val deadline = System.currentTimeMillis() + waitMs
    var got = tryAcquire(spark, dir, name, ttlMs)
    while (got.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(pollMs)
      got = tryAcquire(spark, dir, name, ttlMs)
    }
    got
  }

  /** release/renew are check-then-act (no filesystem CAS exists for file
    * content), so both refuse to touch a lease within this margin of its
    * expiry: in that window a thief may legitimately steal between our
    * read and our write, and acting on the dying lease would clobber the
    * thief's fresh one. A holder that close to expiry must let the TTL
    * lapse and re-acquire — the same rule the reference's TTL enforces. */
  val ExpiryMarginMs: Long = 500L

  /** Minimum age before [[sweepDebris]] may delete a tomb/tmp file. An
    * in-flight renew tmp parses as lapsed garbage for an instant between
    * create and write; the age gate keeps the janitor's hands off any
    * file young enough to still be part of a live operation. */
  val DebrisGraceMs: Long = 60000L

  private def safelyHeld(l: Lease, lease: Lease): Boolean =
    l.lockId == lease.lockId &&
      l.expiresAtMs > System.currentTimeMillis() + ExpiryMarginMs

  /** Release iff `lease` is still the holder AND not about to expire (an
    * expired-or-dying lease must not delete a thief's fresh lock).
    * Returns true iff released. */
  def release(spark: SparkSession, dir: String, lease: Lease): Boolean = {
    val f = fs(spark, dir)
    val p = lockPath(dir, lease.name)
    readLease(f, p, lease.name) match {
      case Some(l) if safelyHeld(l, lease) => f.delete(p, false)
      case _ => false
    }
  }

  /** Extend a still-held lease by `ttlMs` from now (atomic file replace,
    * same rename idiom as the Snapshots pointer). None if no longer held. */
  def renew(spark: SparkSession, dir: String, lease: Lease,
            ttlMs: Long): Option[Lease] = {
    val f = fs(spark, dir)
    val p = lockPath(dir, lease.name)
    readLease(f, p, lease.name) match {
      case Some(l) if safelyHeld(l, lease) =>
        val renewed = lease.copy(expiresAtMs = System.currentTimeMillis() + ttlMs)
        val tmp = new Path(s"$dir/_lock_${lease.name}.tmp.${renewed.lockId}")
        val out = f.create(tmp, true)
        try out.write(s"${renewed.lockId},${renewed.expiresAtMs}".getBytes("UTF-8"))
        finally out.close()
        try {
          fc(spark, new Path(dir)).rename(tmp, p, Options.Rename.OVERWRITE)
          Some(renewed)
        } catch {
          case _: java.io.IOException =>
            // tmp raced away (a janitor sweep, a dying stealer's cleanup):
            // the renewal did not land. Report the lease lost — the None
            // contract the caller already handles — instead of letting the
            // holder's renewal loop die on an uncaught rename failure.
            try f.delete(tmp, false)
            catch { case scala.util.control.NonFatal(_) => () }
            None
        }
      case _ => None
    }
  }

  /** Delete leftover steal tombs and renew temps whose lease has lapsed —
    * the janitor for files the crash paths can strand (a stealer dying
    * between rename-away and create leaves its tomb; a kept-tomb restore
    * loss is documented to leave one deliberately). Only EXPIRED debris is
    * removed: a fresh tomb may be a displaced holder's live record (the
    * kept-tomb path), and destroying it would destroy their proof of
    * displacement. Safe to run any time; returns the number deleted. */
  def sweepDebris(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    if (!f.exists(new Path(dir))) return 0
    val now = System.currentTimeMillis()
    f.listStatus(new Path(dir))
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith("_lock_") && (n.contains(".tomb.") || n.contains(".tmp."))
      }
      .count { s =>
        // age gate FIRST: a renew's in-flight tmp exists empty between
        // create and write — it reads as garbage (expiresAtMs = 0, i.e.
        // "lapsed"), and sweeping it in that window would yank the file
        // out from under the holder's rename. Anything genuinely stranded
        // is by definition old; live in-flight files never are.
        val oldEnough = s.getModificationTime + DebrisGraceMs < now
        // short-circuit: the lease read (an open+read RPC per file) only
        // runs for files old enough to be deletable at all
        oldEnough &&
          readLease(f, s.getPath, "").forall(_.expiresAtMs < now) &&
          f.delete(s.getPath, false)
      }
  }

  /** Run `body` under the named lock (acquire-or-throw, always release) —
    * the SDK-side convenience the reference documents for business
    * transactions spanning several operations. */
  def withLock[A](spark: SparkSession, dir: String, name: String,
                  ttlMs: Long, waitMs: Long = 10000L)(body: => A): A = {
    val lease = acquire(spark, dir, name, ttlMs, waitMs).getOrElse(
      throw new IllegalStateException(
        s"lock '$name' not acquired within ${waitMs}ms"))
    try body finally {
      // a release failure must not MASK the body's own exception: the
      // lock self-heals via TTL, but a business failure suppressed by a
      // transient delete IOException from this finally block is lost
      try release(spark, dir, lease)
      catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"withLock: releasing '${lease.name}' failed (the lease " +
              s"expires by TTL): $e")
      }
    }
  }
}
