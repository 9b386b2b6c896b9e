package graft

import graft.operators.IndexLifecycle

/**
 * The abandon fence: `abandonTornAppends` racing a LIVE maintaining
 * stream was excluded only by the single-writer contract through r16 —
 * if the sweep fired between an append's stage-move and its marker
 * write, it classified the in-flight intent as torn, deleted the
 * just-moved files, and the append then wrote a marker claiming a batch
 * whose files were gone (replays no-op on it: silent data loss). These
 * tests drive the race deterministically through appendOnceImpl's
 * `onStep` hook and pin the machine-enforced outcome: the batch either
 * re-appends cleanly on replay or refuses loudly — NEVER a surviving
 * marker over missing files.
 */
class AbandonFenceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** A minimal CAS-versioned artifact: one `rows` table under v=1. */
  private def mkArtifact(dir: String): String = {
    val root = s"$dir/art"
    Seq((1L, "seed")).toDF("id", "txt").write.parquet(s"$root/v=1/rows")
    IndexLifecycle.flipPointer(spark, root, 1L)
    root
  }

  private def stageBatch(rows: Seq[(Long, String)])(staging: String): Unit =
    rows.toDF("id", "txt").write.mode("overwrite").parquet(s"$staging/rows")

  private def readRows(root: String): Set[(Long, String)] =
    spark.read.parquet(s"${IndexLifecycle.resolveDir(spark, root)}/rows")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def appendsFiles(root: String): Seq[String] = {
    val p = java.nio.file.Paths.get(root, "_appends")
    if (!java.nio.file.Files.exists(p)) Nil
    else java.nio.file.Files.list(p).toArray.toSeq
      .map(_.toString.split('/').last)
  }

  test("abandon firing between stage-move and marker write: the append " +
       "REFUSES (no marker over deleted files) and the replay re-appends " +
       "cleanly") {
    val root = mkArtifact(tmp("graft-fence-premarker"))
    val runId = "live-stream"
    val batch = Seq((2L, "two"), (3L, "three"))
    val e = intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
        stageBatch(batch), failAt = "",
        onStep = s => if (s == "moved")
          IndexLifecycle.abandonTornAppends(spark, root))
    }
    assert(e.getMessage.contains("lost the abandon fence"), s"$e")
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId).isEmpty,
      "NEVER a marker over missing files")
    assert(readRows(root) == Set((1L, "seed")),
      "the artifact must read as if the batch never ran")
    // replay re-appends cleanly and clears the sweep's drop record
    assert(IndexLifecycle.appendOnce(spark, root, runId, 0L)(stageBatch(batch)),
      "the replay must append")
    assert(readRows(root) == Set((1L, "seed"), (2L, "two"), (3L, "three")))
    assert(IndexLifecycle.pendingIntents(spark, root).isEmpty)
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")),
      "a healed batch's drop record must be cleared")
    // a redelivery is a plain no-op again
    assert(!IndexLifecycle.appendOnce(spark, root, runId, 0L)(stageBatch(batch)))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two"), (3L, "three")))
  }

  test("abandon firing in the window between the fence pre-check and the " +
       "marker write: the append detects it POST-marker, rolls the marker " +
       "back to its pre-batch state, and refuses") {
    val root = mkArtifact(tmp("graft-fence-postmarker"))
    val runId = "live-stream"
    assert(IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two")))))
    val e = intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 1L,
        stageBatch(Seq((3L, "three"))), failAt = "",
        onStep = s => if (s == "pre-marker")
          IndexLifecycle.abandonTornAppends(spark, root))
    }
    assert(e.getMessage.contains("AFTER writing its marker"), s"$e")
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId) == Some(0L),
      "the marker must roll back to the last real commit, not claim batch 1")
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")))
    // replay of batch 1 re-appends cleanly on top
    assert(IndexLifecycle.appendOnce(spark, root, runId, 1L)(
      stageBatch(Seq((3L, "three")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two"), (3L, "three")))
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId) == Some(1L))
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")))
  }

  test("the CRASH hole: append loses the fence, writes its marker, and " +
       "dies before the post-check — the sweep's drop record makes the " +
       "replay re-append instead of no-opping on the lying marker") {
    val root = mkArtifact(tmp("graft-fence-lying-marker"))
    val runId = "live-stream"
    val e = intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
        stageBatch(Seq((2L, "two"))), failAt = "marked",
        onStep = s => if (s == "pre-marker")
          IndexLifecycle.abandonTornAppends(spark, root))
    }
    assert(e.getMessage.contains("failpoint: marked"), s"$e")
    // the worst state the race can leave: a marker claiming a batch whose
    // files are gone, plus the sweep's drop record
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId) == Some(0L))
    assert(readRows(root) == Set((1L, "seed")))
    assert(appendsFiles(root).exists(_.startsWith("dropped-")),
      "the sweep must have recorded the drop before deleting")
    // the replay HEALS: re-appends despite the covering marker
    assert(IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two")))),
      "the replay must re-append, not no-op on the lying marker")
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")))
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")))
    // a SECOND redelivery is a plain no-op again (record cleared)
    assert(!IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")))
  }

  test("appendOnce refuses while the fence reads 'running' (in-flight or " +
       "crashed sweep); rerunning the sweep completes it and unblocks") {
    val root = mkArtifact(tmp("graft-fence-running"))
    val appends = java.nio.file.Paths.get(root, "_appends")
    java.nio.file.Files.createDirectories(appends)
    java.nio.file.Files.write(appends.resolve("_abandoned"),
      "7\nrunning".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      IndexLifecycle.appendOnce(spark, root, "r", 0L)(
        stageBatch(Seq((2L, "x"))))
    }
    assert(e.getMessage.contains("in flight"), s"$e")
    IndexLifecycle.abandonTornAppends(spark, root) // completes the sweep
    assert(IndexLifecycle.appendOnce(spark, root, "r", 0L)(
      stageBatch(Seq((2L, "x")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "x")))
  }

  test("the sweep's LAST-INSTANT marker re-read: a racing append that " +
       "commits between classification and deletion reclassifies as " +
       "committed debris — its files survive, no drop record is written") {
    val root = mkArtifact(tmp("graft-fence-lastinstant"))
    val runId = "racer"
    val tag = IndexLifecycle.runTag(runId)
    intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
        stageBatch(Seq((2L, "two"))), failAt = "moved")
    }
    // classification sees the intent torn; before the sweep's per-intent
    // re-read, the racing append's marker lands (simulated by hand — the
    // real appendOnce would be blocked by the 'running' fence, which is
    // exactly why this last-instant path only matters for pre-fence
    // appends already past their own checks)
    IndexLifecycle.abandonTornAppendsImpl(spark, root, _ =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, "_appends", s"run-$tag"),
        s"0\n$runId\n0".getBytes("UTF-8")))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")),
      "the last-instant re-read must keep the committed racer's files")
    assert(IndexLifecycle.pendingIntents(spark, root).isEmpty)
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")),
      "no drop record for a batch whose files were kept")
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId) == Some(0L))
  }

  test("a sweep still RUNNING when the post-marker wait times out: the " +
       "append rolls its marker back and refuses (the sweep's decision " +
       "is unknowable — committing would be loss or duplicates depending " +
       "on when it wakes); the replay re-appends exactly once") {
    val root = mkArtifact(tmp("graft-fence-timeout"))
    val runId = "live-stream"
    val appends = java.nio.file.Paths.get(root, "_appends")
    val e = intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
        stageBatch(Seq((2L, "two"))), failAt = "",
        onStep = s => if (s == "pre-marker") {
          // a sweep bumps the fence and stalls (never publishes done)
          java.nio.file.Files.createDirectories(appends)
          java.nio.file.Files.write(appends.resolve("_abandoned"),
            "5\nrunning".getBytes("UTF-8"))
        },
        fenceWaitMs = 300L)
    }
    assert(e.getMessage.contains("still running"), s"$e")
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId).isEmpty,
      "the marker must be rolled back — never a marker under an " +
        "unadjudicated sweep")
    // the stalled sweep completes (or is rerun); the replay then heals
    IndexLifecycle.abandonTornAppends(spark, root)
    assert(IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")),
      "exactly-once after the stalled-sweep refusal")
  }

  test("timeout while the stalled sweep had KEEP-decided in flight (the " +
       "invisible window: marker re-read done, intent not yet deleted): " +
       "the append refuses with its own drop record, and the heal sweeps " +
       "the kept files by name prefix before re-appending — exactly-once, " +
       "never duplicates") {
    val root = mkArtifact(tmp("graft-fence-timeout-keep"))
    val runId = "live-stream"
    val tag = IndexLifecycle.runTag(runId)
    val appends = java.nio.file.Paths.get(root, "_appends")
    val e = intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
        stageBatch(Seq((2L, "two"), (3L, "three"))), failAt = "",
        onStep = s => if (s == "marked") {
          // the sweep bumped the fence and is mid-decision — nothing of
          // its verdict is persisted yet
          java.nio.file.Files.createDirectories(appends)
          java.nio.file.Files.write(appends.resolve("_abandoned"),
            "5\nrunning".getBytes("UTF-8"))
        },
        fenceWaitMs = 300L)
    }
    assert(e.getMessage.contains("not observable"), s"$e")
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId).isEmpty,
      "the marker must be rolled back")
    assert(appendsFiles(root).contains(s"dropped-$tag-0"),
      "the refusing append must leave its own drop record")
    // the sweep lands on KEEP: it saw the (pre-rollback) marker, keeps
    // the files as live data, sweeps the intent, publishes done
    java.nio.file.Files.deleteIfExists(appends.resolve(s"intent-$tag-0"))
    java.nio.file.Files.write(appends.resolve("_abandoned"),
      "5\ndone".getBytes("UTF-8"))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two"), (3L, "three")),
      "precondition: the kept files are live with no marker and no intent")
    // the replay HEALS: prefix-sweeps the kept leftovers, re-appends once
    assert(IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two"), (3L, "three")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two"), (3L, "three")),
      "NEVER duplicates — the heal must remove the kept files first")
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")))
    // a second redelivery is a plain no-op
    assert(!IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two"), (3L, "three")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two"), (3L, "three")))
  }

  test("a REAL sweep whose committed classification raced a fence-timeout " +
       "rollback must NOT delete the append's drop record (fresh marker " +
       "re-check): the record survives, the heal prefix-sweeps the kept " +
       "files, exactly-once") {
    // the pass-5 interleaving: sweep classifies the intent COMMITTED off
    // the then-covering marker; the timed-out append writes its record
    // and rolls the marker back BEFORE the sweep's record adjudication;
    // the stale-record delete must notice the rollback and keep the
    // record — deleting it would leave (no marker, no record, files
    // live) and the replay would duplicate the batch.
    val root = mkArtifact(tmp("graft-fence-sweep-vs-rollback"))
    val runId = "live-stream"
    val tag = IndexLifecycle.runTag(runId)
    val appends = java.nio.file.Paths.get(root, "_appends")
    intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
        stageBatch(Seq((2L, "two"), (3L, "three"))), failAt = "marked")
    }
    // marker written (covering), intent + files live — the committed-
    // debris state a sweep classifies keepFiles from. Plant the append's
    // drop record (its timeout path wrote it before rolling back)...
    java.nio.file.Files.write(appends.resolve(s"dropped-$tag-0"),
      runId.getBytes("UTF-8"))
    // ...and run the REAL sweep, injecting the rollback in the window
    // between its classification and its record adjudication
    IndexLifecycle.abandonTornAppendsImpl(spark, root, name =>
      if (name == s"intent-$tag-0")
        java.nio.file.Files.deleteIfExists(appends.resolve(s"run-$tag")))
    assert(appendsFiles(root).contains(s"dropped-$tag-0"),
      "the sweep must keep the record — the marker no longer covers the batch")
    assert(readRows(root) == Set((1L, "seed"), (2L, "two"), (3L, "three")),
      "precondition: kept files live, no marker, record present")
    // the replay HEALS exactly-once: prefix-sweep then re-append
    assert(IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two"), (3L, "three")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two"), (3L, "three")),
      "NEVER duplicates")
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")))
    assert(!IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two"), (3L, "three")))))
  }

  test("timeout while the stalled sweep had DROPPED the batch (record " +
       "written, files deleted, intent swept): refuse with the marker " +
       "rolled back; the replay heals once the sweep completes") {
    val root = mkArtifact(tmp("graft-fence-timeout-dropped"))
    val runId = "live-stream"
    val tag = IndexLifecycle.runTag(runId)
    val appends = java.nio.file.Paths.get(root, "_appends")
    val e = intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
        stageBatch(Seq((2L, "two"))), failAt = "",
        onStep = s => if (s == "marked") {
          java.nio.file.Files.createDirectories(appends)
          java.nio.file.Files.write(appends.resolve("_abandoned"),
            "5\nrunning".getBytes("UTF-8"))
          java.nio.file.Files.write(appends.resolve(s"dropped-$tag-0"),
            runId.getBytes("UTF-8"))
          // the sweep's deletions: every file the intent listed
          val intent = appends.resolve(s"intent-$tag-0")
          java.nio.file.Files.readAllLines(intent).toArray.map(_.toString)
            .filterNot(_.startsWith("#")).filter(_.nonEmpty)
            .foreach(rel => java.nio.file.Files.deleteIfExists(
              java.nio.file.Paths.get(root, "v=1", rel)))
          java.nio.file.Files.delete(intent)
        },
        fenceWaitMs = 300L)
    }
    assert(e.getMessage.contains("still running"), s"$e")
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId).isEmpty,
      "the marker must be rolled back — it would lie about deleted files")
    assert(readRows(root) == Set((1L, "seed")))
    // the sweep completes; the replay heals via the record
    java.nio.file.Files.write(appends.resolve("_abandoned"),
      "5\ndone".getBytes("UTF-8"))
    assert(IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")))
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")))
  }

  test("a sweep observed DONE that never touched the batch: the commit " +
       "stands and a stale drop record for the batch is cleared") {
    val root = mkArtifact(tmp("graft-fence-done-survive"))
    val runId = "live-stream"
    val tag = IndexLifecycle.runTag(runId)
    val appends = java.nio.file.Paths.get(root, "_appends")
    assert(IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
      stageBatch(Seq((2L, "two"))), failAt = "",
      onStep = s => if (s == "pre-marker") {
        // a sweep ran to completion mid-append: fence bumped to done,
        // plus a drop record it wrote before failing to delete anything
        java.nio.file.Files.createDirectories(appends)
        java.nio.file.Files.write(appends.resolve("_abandoned"),
          "5\ndone".getBytes("UTF-8"))
        java.nio.file.Files.write(appends.resolve(s"dropped-$tag-0"),
          runId.getBytes("UTF-8"))
      }))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")))
    assert(IndexLifecycle.lastAppendedBatch(spark, root, runId) == Some(0L))
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")),
      "the stale record must be cleared by the surviving commit")
    // redelivery: plain no-op, no phantom heal
    assert(!IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two")))))
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")))
  }

  test("a sweep that THROWS mid-run leaves the fence 'running' (appends " +
       "refuse — the documented direction) until a rerun completes") {
    val root = mkArtifact(tmp("graft-fence-throwing"))
    intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, "dead-run", 0L,
        stageBatch(Seq((2L, "two"))), failAt = "moved")
    }
    intercept[RuntimeException] {
      IndexLifecycle.abandonTornAppendsImpl(spark, root,
        _ => throw new RuntimeException("injected sweep failure"))
    }
    val e = intercept[IllegalStateException] {
      IndexLifecycle.appendOnce(spark, root, "other-run", 0L)(
        stageBatch(Seq((3L, "x"))))
    }
    assert(e.getMessage.contains("in flight"),
      s"a failed sweep must leave the fence blocking: $e")
    IndexLifecycle.abandonTornAppends(spark, root) // the rerun completes
    assert(IndexLifecycle.appendOnce(spark, root, "other-run", 0L)(
      stageBatch(Seq((3L, "x")))))
    assert(readRows(root) == Set((1L, "seed"), (3L, "x")))
  }

  test("rerun adjudication of a crashed sweep's drop record: files all " +
       "alive ⇒ the record SURVIVES the sweep (only the append side " +
       "deletes records) and a redelivery heals idempotently; files " +
       "partially dead ⇒ the deletion is finished and the record kept, " +
       "so the heal replays against a clean slate") {
    // CASE 1: crashed sweep wrote the record, deleted nothing; the racing
    // append's marker landed. The rerun keeps the files AND the record
    // (record deletion belongs to the append side alone); a redelivery
    // HEALS — prefix-sweeping the live files before re-appending, so the
    // data stays exactly-once — and its commit clears the record.
    val root = mkArtifact(tmp("graft-fence-stale-record"))
    val runId = "racer"
    val tag = IndexLifecycle.runTag(runId)
    intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root, runId, 0L,
        stageBatch(Seq((2L, "two"))), failAt = "moved")
    }
    val appends = java.nio.file.Paths.get(root, "_appends")
    java.nio.file.Files.write(appends.resolve(s"dropped-$tag-0"),
      runId.getBytes("UTF-8"))
    java.nio.file.Files.write(appends.resolve(s"run-$tag"),
      s"0\n$runId\n0".getBytes("UTF-8"))
    IndexLifecycle.abandonTornAppends(spark, root)
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")))
    assert(appendsFiles(root).contains(s"dropped-$tag-0"),
      "the sweep must never delete records — the append side owns them")
    assert(IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two")))),
      "redelivery heals through the record")
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")),
      "the heal is idempotent — never duplicates the live rows")
    assert(!appendsFiles(root).exists(_.startsWith("dropped-")),
      "the healing commit clears the record")
    assert(!IndexLifecycle.appendOnce(spark, root, runId, 0L)(
      stageBatch(Seq((2L, "two")))), "then a plain no-op again")
    assert(readRows(root) == Set((1L, "seed"), (2L, "two")))

    // CASE 2: the crashed sweep got PARTWAY (one of two files deleted)
    // before the marker landed. Keeping the survivor would make the heal
    // duplicate it — the rerun must finish the deletion and keep the
    // record; the heal then replays the whole batch cleanly.
    val root2 = mkArtifact(tmp("graft-fence-partial-record"))
    intercept[IllegalStateException] {
      IndexLifecycle.appendOnceImpl(spark, root2, runId, 0L,
        staging => Seq((2L, "two"), (3L, "three")).toDF("id", "txt")
          .repartition(2).write.mode("overwrite").parquet(s"$staging/rows"),
        failAt = "moved")
    }
    val appends2 = java.nio.file.Paths.get(root2, "_appends")
    java.nio.file.Files.write(appends2.resolve(s"dropped-$tag-0"),
      runId.getBytes("UTF-8"))
    java.nio.file.Files.write(appends2.resolve(s"run-$tag"),
      s"0\n$runId\n0".getBytes("UTF-8"))
    // simulate the crashed sweep's partial deletion: one moved file gone
    val intentLines = java.nio.file.Files.readAllLines(
      appends2.resolve(s"intent-$tag-0")).toArray.map(_.toString)
      .filterNot(_.startsWith("#")).filter(_.nonEmpty)
    assert(intentLines.length >= 2, s"need ≥2 moved files: ${intentLines.toSeq}")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root2, "v=1", intentLines.head))
    IndexLifecycle.abandonTornAppends(spark, root2)
    assert(readRows(root2) == Set((1L, "seed")),
      "the rerun must finish the partial deletion, not keep survivors")
    assert(appendsFiles(root2).contains(s"dropped-$tag-0"),
      "the record is TRUTH here and must survive the rerun")
    assert(IndexLifecycle.appendOnce(spark, root2, runId, 0L)(
      stageBatch(Seq((2L, "two"), (3L, "three")))),
      "the heal must re-append against the clean slate")
    assert(readRows(root2) == Set((1L, "seed"), (2L, "two"), (3L, "three")))
    assert(!appendsFiles(root2).exists(_.startsWith("dropped-")))
  }

  test("vacuum never deletes a version ABOVE the pointer: a rebuild's " +
       "fully-staged v=N+1 survives a concurrent vacuum and the flip " +
       "lands on intact data; versions below are dropped") {
    val root = mkArtifact(tmp("graft-vacuum-staged"))
    // grow history: v=2 becomes current, v=1 is genuinely stale
    Seq((1L, "seed"), (2L, "more")).toDF("id", "txt")
      .write.parquet(s"$root/v=2/rows")
    IndexLifecycle.flipPointer(spark, root, 2L)
    // a rebuild stages v=3 but has not flipped yet
    Seq((1L, "seed"), (2L, "more"), (3L, "new"))
      .toDF("id", "txt").write.parquet(s"$root/v=3/rows")
    IndexLifecycle.vacuum(spark, root)
    val left = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).toSet
    assert(left == Set("v=2", "v=3"),
      s"vacuum must drop only versions below current: $left")
    // the in-flight rebuild completes — readers resolve intact data
    IndexLifecycle.flipPointer(spark, root, 3L)
    assert(readRows(root) == Set((1L, "seed"), (2L, "more"), (3L, "new")))
  }

  test("a runId containing a newline is refused up front (markers, " +
       "intents and drop records store it line-oriented)") {
    val root = mkArtifact(tmp("graft-fence-newline"))
    val e = intercept[IllegalArgumentException] {
      IndexLifecycle.appendOnce(spark, root, "bad\nrun", 0L)(
        stageBatch(Seq((2L, "x"))))
    }
    assert(e.getMessage.contains("newline"), s"$e")
  }
}
