package graft

import graft.operators.{Bundles, IndexLifecycle, Snapshots, TermStats}
import org.apache.spark.sql.functions._

/** Backup/restore bundle parity (reference backup.go/restore.go): export
  * == import round trips on both artifact families, torn bundles refused
  * before the target is touched, and the import-under-live-reader race
  * closed by the flip-pointer-last discipline. */
class BundlesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def bm25(idx: String): Seq[(Long, Double)] =
    TermStats.bm25TopKPrebuilt(spark, idx, "doc_id", Seq("a", "d"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("text-index bundle round trip: export current, import to a fresh " +
       "root, identical probe results and version number") {
    val docs = Seq((1L, "a b a c"), (2L, "a c c"), (3L, "d d b"))
      .toDF("doc_id", "text")
    val src = tmp("graft-bsrc") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    val want = bm25(src)

    val bundle = tmp("graft-bdl") + "/b1"
    val info = Bundles.exportBundle(spark, src, bundle)
    assert(info.pointerName == "_current" && info.versions == Seq(1L) &&
      info.current == 1L && info.files > 0 && info.bytes > 0)

    val dst = tmp("graft-bdst") + "/idx"
    val imported = Bundles.importBundle(spark, bundle, dst)
    assert(imported.current == 1L && imported.versions == Seq(1L))
    assert(IndexLifecycle.currentVersion(spark, dst).contains(1L))
    assert(bm25(dst) == want, "restored index must serve identically")
  }

  test("export refuses a torn-append current version (a backup of partial " +
       "batch files would certify an inconsistent artifact); pinned " +
       "non-current versions and committed debris still export") {
    val docs = Seq((1L, "a b a c"), (2L, "a c c")).toDF("doc_id", "text")
    val src = tmp("graft-btorn") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    TermStats.compactTextIndexInPlace(spark, src) // v=2 current, v=1 pinned
    intercept[IllegalStateException] {
      TermStats.appendTextIndexOnceAt(
        Seq((3L, "d d b")).toDF("doc_id", "text"),
        "text", "doc_id", src, "dead-run", 0L, failAt = "half-moved")
    }
    val e = intercept[IllegalArgumentException] {
      Bundles.exportBundle(spark, src, tmp("graft-btornb") + "/b")
    }
    assert(e.getMessage.contains("torn append"), s"$e")
    // the immutable pinned version is unaffected by the current's tear
    Bundles.exportBundle(spark, src, tmp("graft-bpin") + "/b",
      version = Some(1L))
    // self-heal, then export proceeds; committed debris (crash after the
    // marker, intent left) must NOT block an export either
    TermStats.appendTextIndexOnce(Seq((3L, "d d b")).toDF("doc_id", "text"),
      "text", "doc_id", src, "dead-run", 0L)
    intercept[IllegalStateException] {
      TermStats.appendTextIndexOnceAt(
        Seq((4L, "e e")).toDF("doc_id", "text"),
        "text", "doc_id", src, "dead-run", 1L, failAt = "marked")
    }
    val bundle = tmp("graft-bheal") + "/b"
    Bundles.exportBundle(spark, src, bundle)
    val dst = tmp("graft-bhealdst") + "/idx"
    Bundles.importBundle(spark, bundle, dst)
    assert(bm25(dst) == bm25(src),
      "post-heal export must round trip the appended corpus")
  }

  test("snapshot bundle round trip (the _latest pointer family): read() " +
       "and a version-pinned read come back equal") {
    val dir = tmp("graft-bsnap") + "/snap"
    Snapshots.commit(Seq((1L, "x"), (2L, "y")).toDF("k", "v"), dir)
    Snapshots.commit(Seq((1L, "x2"), (3L, "z")).toDF("k", "v"), dir)
    val want = Snapshots.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    val bundle = tmp("graft-bdl2") + "/b"
    val info = Bundles.exportBundle(spark, dir, bundle, allVersions = true)
    assert(info.pointerName == "_latest" && info.versions == Seq(0L, 1L))

    val dst = tmp("graft-bdst2") + "/snap"
    Bundles.importBundle(spark, bundle, dst)
    val got = Snapshots.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == want, s"restored snapshot drifted: $got vs $want")
    // history travelled too: the pre-compaction version is readable
    assert(Snapshots.read(spark, dst, Some(0L)).count() == 2)
  }

  test("torn bundles are refused before the target is touched: no " +
       "manifest, missing file, size mismatch") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val src = tmp("graft-btorn") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)

    // 1. manifest missing (writer died mid-copy)
    val b1 = tmp("graft-bdl3") + "/b"
    Bundles.exportBundle(spark, src, b1)
    fs.delete(new org.apache.hadoop.fs.Path(s"$b1/_manifest"), false)
    val dst = tmp("graft-bdst3") + "/idx"
    val e1 = intercept[IllegalStateException] {
      Bundles.importBundle(spark, b1, dst)
    }
    assert(e1.getMessage.contains("_manifest"))

    // 2. a listed file missing
    val b2 = tmp("graft-bdl4") + "/b"
    Bundles.exportBundle(spark, src, b2)
    val victim = fs.listFiles(
        new org.apache.hadoop.fs.Path(s"$b2/v=1/postings"), true).next().getPath
    fs.delete(victim, false)
    val e2 = intercept[IllegalStateException] {
      Bundles.importBundle(spark, b2, dst)
    }
    assert(e2.getMessage.contains("missing"))

    // 3. size mismatch (truncated transfer)
    val b3 = tmp("graft-bdl5") + "/b"
    Bundles.exportBundle(spark, src, b3)
    val victim3 = fs.listFiles(
        new org.apache.hadoop.fs.Path(s"$b3/v=1/postings"), true).next().getPath
    val out = fs.create(victim3, true)
    try out.write("short".getBytes("UTF-8")) finally out.close()
    val e3 = intercept[IllegalStateException] {
      Bundles.importBundle(spark, b3, dst)
    }
    assert(e3.getMessage.contains("bytes"))
    // in all three cases the target was never created
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst)),
      "a refused import must leave the target untouched")
  }

  test("import onto a LIVE artifact: refused without overwrite; with it, " +
       "versions renumber after the target's newest, a concurrent reader " +
       "keeps its pre-import files, and rollback is a pointer flip") {
    val oldDocs = Seq((1L, "a b a c"), (2L, "a c c")).toDF("doc_id", "text")
    val newDocs = Seq((7L, "a d d"), (8L, "d b")).toDF("doc_id", "text")
    val live = tmp("graft-blive") + "/idx"
    TermStats.buildTextIndex(oldDocs, "text", "doc_id", live)
    val preImport = bm25(live)

    val srcNew = tmp("graft-bnew") + "/idx"
    TermStats.buildTextIndex(newDocs, "text", "doc_id", srcNew)
    val wantNew = bm25(srcNew)
    val bundle = tmp("graft-bdl6") + "/b"
    Bundles.exportBundle(spark, srcNew, bundle)

    intercept[IllegalArgumentException] {
      Bundles.importBundle(spark, bundle, live)
    }

    // a reader that resolved the artifact BEFORE the import
    val dir = IndexLifecycle.resolveDir(spark, live)
    val liveReader = spark.read.parquet(s"$dir/postings")

    val info = Bundles.importBundle(spark, bundle, live, overwrite = true)
    assert(info.versions == Seq(2L) && info.current == 2L,
      s"bundled v=1 must renumber to v=2 on the live target: $info")
    assert(IndexLifecycle.currentVersion(spark, live).contains(2L))
    assert(bm25(live) == wantNew, "post-import probes must serve the bundle")
    // the pre-import reader still reads ITS version's files
    assert(liveReader.count() > 0)
    // rollback = flip back; the old version was never touched
    IndexLifecycle.flipPointer(spark, live, 1L)
    assert(bm25(live) == preImport, "rollback must restore pre-import results")
  }

  test("import refuses a LEGACY FLAT target outright: dropping v=1 + a " +
       "pointer beside unversioned tables would hijack its readers") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val src = tmp("graft-bflat-src") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    val bundle = tmp("graft-bdl9") + "/b"
    Bundles.exportBundle(spark, src, bundle)
    // hand-build a legacy FLAT artifact (tables directly under the root)
    val flat = tmp("graft-bflat") + "/idx"
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .write.parquet(s"$flat/postings")
    val e = intercept[IllegalArgumentException] {
      Bundles.importBundle(spark, bundle, flat, overwrite = true)
    }
    assert(e.getMessage.contains("flat"), e.getMessage)
    // the flat artifact is untouched: no pointer, no v= dir appeared
    assert(IndexLifecycle.currentVersion(spark, flat).isEmpty)
    assert(TermStats.resolveIndexDir(spark, flat) == flat)
  }

  test("restore replay contract is MACHINE-ENFORCED: an old checkpoint " +
       "replaying against a restored artifact refuses loudly (never a " +
       "silent double-append); a fresh checkpoint proceeds") {
    val docs = Seq((1L, "a b a c"), (2L, "a c c")).toDF("doc_id", "text")
    val src = tmp("graft-brc") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    val oldRun = "old-checkpoint"
    assert(TermStats.appendTextIndexOnce(
      Seq((3L, "d d b")).toDF("doc_id", "text"),
      "text", "doc_id", src, oldRun, 0L))
    assert(TermStats.appendTextIndexOnce(
      Seq((4L, "b c d")).toDF("doc_id", "text"),
      "text", "doc_id", src, oldRun, 1L))
    val want = bm25(src)
    val bundle = tmp("graft-brcb") + "/b"
    Bundles.exportBundle(spark, src, bundle)

    // DR restore to a fresh root: the resumed old checkpoint re-delivers
    // its last in-flight batch (id 1, already inside the bundle). With no
    // markers in the bundle this used to double-append on the scaladoc's
    // honor system; the restore epoch now refuses it mechanically.
    val dst = tmp("graft-brcd") + "/idx"
    Bundles.importBundle(spark, bundle, dst)
    val e1 = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((4L, "b c d")).toDF("doc_id", "text"),
        "text", "doc_id", dst, oldRun, 1L)
    }
    assert(e1.getMessage.contains("FRESH checkpoint"), s"$e1")
    assert(bm25(dst) == want, "the refused replay must not touch the data")
    // even a batch-0 redelivery is refused: by batchId alone it is
    // indistinguishable from a fresh start, but the bundle shipped the
    // source's run inventory and this runId is in it
    val e0 = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((3L, "d d b")).toDF("doc_id", "text"),
        "text", "doc_id", dst, oldRun, 0L)
    }
    assert(e0.getMessage.contains("FRESH checkpoint") &&
      e0.getMessage.contains("batchId 0"), s"$e0")

    // import ONTO the live original (rollback shape): the old run's
    // marker survives at the root but PREDATES the restore — equally
    // refused (no-opping batch 2 on a pre-restore marker would drop it)
    Bundles.importBundle(spark, bundle, src, overwrite = true)
    val e2 = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((5L, "d d d")).toDF("doc_id", "text"),
        "text", "doc_id", src, oldRun, 2L)
    }
    assert(e2.getMessage.contains("FRESH checkpoint"), s"$e2")

    // the documented remediation works: a fresh checkpoint (batchIds
    // restart at 0) appends, continues, and its own replays still no-op
    val fresh = Seq((5L, "d d d")).toDF("doc_id", "text")
    assert(TermStats.appendTextIndexOnce(fresh, "text", "doc_id", dst,
      "new-checkpoint", 0L))
    assert(TermStats.appendTextIndexOnce(
      Seq((6L, "b b d")).toDF("doc_id", "text"),
      "text", "doc_id", dst, "new-checkpoint", 1L))
    assert(!TermStats.appendTextIndexOnce(
      Seq((6L, "b b d")).toDF("doc_id", "text"),
      "text", "doc_id", dst, "new-checkpoint", 1L),
      "the fresh run's replay guard still no-ops its committed batches")
    val rebuilt = tmp("graft-brcr") + "/idx"
    TermStats.buildTextIndex(
      docs.union(Seq((3L, "d d b"), (4L, "b c d"), (5L, "d d d"),
        (6L, "b b d")).toDF("doc_id", "text")),
      "text", "doc_id", rebuilt)
    assert(bm25(dst) == bm25(rebuilt),
      "restored + fresh-checkpoint-maintained artifact == rebuild")
  }

  test("a legacy bundle without the run inventory falls back to the " +
       "strict heuristic: markerless mid-stream resumes refuse, a fresh " +
       "run starting at batch 0 proceeds") {
    val docs = Seq((1L, "a b a c"), (2L, "a c c")).toDF("doc_id", "text")
    val src = tmp("graft-blg-src") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    assert(TermStats.appendTextIndexOnce(
      Seq((3L, "d d b")).toDF("doc_id", "text"),
      "text", "doc_id", src, "old-run", 0L))
    val bundle = tmp("graft-blg-b") + "/b"
    Bundles.exportBundle(spark, src, bundle)
    // strip the runs=/run= lines — the pre-r16 manifest format
    val mf = java.nio.file.Paths.get(bundle, "_manifest")
    val legacy = java.nio.file.Files.readAllLines(mf).toArray.map(_.toString)
      .filterNot(l => l.startsWith("runs=") || l.startsWith("run="))
    java.nio.file.Files.write(mf, legacy.mkString("\n").getBytes("UTF-8"))
    // drop the LocalFileSystem checksum sidecar the rewrite invalidated
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(bundle, "._manifest.crc"))
    val dst = tmp("graft-blg-d") + "/idx"
    Bundles.importBundle(spark, bundle, dst)
    // no inventory: a mid-stream resume refuses (heuristic)...
    val e = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((4L, "b c d")).toDF("doc_id", "text"),
        "text", "doc_id", dst, "old-run", 1L)
    }
    assert(e.getMessage.contains("incomplete old-run inventory"), s"$e")
    // ...and batch 0 proceeds (the documented residual window of the
    // legacy format — the inventory exists to close it for new bundles)
    assert(TermStats.appendTextIndexOnce(
      Seq((5L, "d d d")).toDF("doc_id", "text"),
      "text", "doc_id", dst, "fresh-run", 0L))
  }

  test("re-exporting a restored-then-maintained artifact carries the " +
       "pre-restore blocked runs forward (markers never travel; without " +
       "the sentinel merge a second-generation restore would launder " +
       "them out of the inventory)") {
    val docs = Seq((1L, "a b a c"), (2L, "a c c")).toDF("doc_id", "text")
    val src = tmp("graft-bgen-src") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    assert(TermStats.appendTextIndexOnce(
      Seq((3L, "d d b")).toDF("doc_id", "text"),
      "text", "doc_id", src, "gen1-run", 0L))
    val b1 = tmp("graft-bgen-b1") + "/b"
    Bundles.exportBundle(spark, src, b1)
    // first restore + fresh maintenance under a NEW run
    val mid = tmp("graft-bgen-mid") + "/idx"
    Bundles.importBundle(spark, b1, mid)
    assert(TermStats.appendTextIndexOnce(
      Seq((4L, "b c d")).toDF("doc_id", "text"),
      "text", "doc_id", mid, "gen2-run", 0L))
    // second-generation bundle of the restored artifact
    val b2 = tmp("graft-bgen-b2") + "/b"
    Bundles.exportBundle(spark, mid, b2)
    val dst = tmp("graft-bgen-dst") + "/idx"
    Bundles.importBundle(spark, b2, dst)
    // BOTH generations' runs are blocked — gen1 only via the carried
    // sentinel (its marker never existed on mid), even at batch 0
    val e1 = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((3L, "d d b")).toDF("doc_id", "text"),
        "text", "doc_id", dst, "gen1-run", 0L)
    }
    assert(e1.getMessage.contains("FRESH checkpoint"), s"$e1")
    val e2 = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((4L, "b c d")).toDF("doc_id", "text"),
        "text", "doc_id", dst, "gen2-run", 0L)
    }
    assert(e2.getMessage.contains("FRESH checkpoint"), s"$e2")
    // the inventory stayed COMPLETE, so a genuinely new run proceeds
    // even when its driver skipped early empty batches
    assert(TermStats.appendTextIndexOnce(
      Seq((5L, "d d d")).toDF("doc_id", "text"),
      "text", "doc_id", dst, "gen3-run", 2L))
  }

  test("a corrupt (unreadable) marker on the source forces the bundle's " +
       "run inventory to incomplete — the import keeps the strict " +
       "mid-stream heuristic instead of certifying false completeness") {
    val docs = Seq((1L, "a b a c"), (2L, "a c c")).toDF("doc_id", "text")
    val src = tmp("graft-bcm-src") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    assert(TermStats.appendTextIndexOnce(
      Seq((3L, "d d b")).toDF("doc_id", "text"),
      "text", "doc_id", src, "known-run", 0L))
    // a truncated marker of some other run the export cannot read
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "_appends", "run-ffffffff"),
      "garbage-not-a-number".getBytes("UTF-8"))
    val bundle = tmp("graft-bcm-b") + "/b"
    Bundles.exportBundle(spark, src, bundle)
    val dst = tmp("graft-bcm-dst") + "/idx"
    Bundles.importBundle(spark, bundle, dst)
    // the readable run is still blocked outright...
    val e1 = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((3L, "d d b")).toDF("doc_id", "text"),
        "text", "doc_id", dst, "known-run", 0L)
    }
    assert(e1.getMessage.contains("FRESH checkpoint"), s"$e1")
    // ...and the unreadable one's intact checkpoint cannot slip through:
    // incomplete inventory keeps the batchId>0 refusal for unknown runs
    val e2 = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((4L, "b c d")).toDF("doc_id", "text"),
        "text", "doc_id", dst, "unreadable-marker-run", 1L)
    }
    assert(e2.getMessage.contains("incomplete old-run inventory"), s"$e2")
  }

  test("the restore sentinel's free-form source note cannot inject " +
       "protocol state: a source string of 'runs=complete' does not " +
       "flip the inventory to complete") {
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val idx = tmp("graft-binj") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", idx)
    IndexLifecycle.markRestored(spark, idx, "runs=complete")
    val e = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((2L, "a c c")).toDF("doc_id", "text"),
        "text", "doc_id", idx, "some-run", 1L)
    }
    assert(e.getMessage.contains("incomplete old-run inventory"),
      s"source-line injection must not disable the heuristic: $e")
  }

  test("import onto a live target REFUSES while the target has torn " +
       "appends pending (post-import abandon would sweep the intent while " +
       "the partial files stay in the old version — a rollback would then " +
       "serve them with no record left)") {
    val docs = Seq((1L, "a b a c"), (2L, "a c c")).toDF("doc_id", "text")
    val src = tmp("graft-btt-src") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    val bundle = tmp("graft-btt-b") + "/b"
    Bundles.exportBundle(spark, src, bundle)
    val live = tmp("graft-btt-live") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", live)
    intercept[IllegalStateException] {
      TermStats.appendTextIndexOnceAt(
        Seq((3L, "d d b")).toDF("doc_id", "text"),
        "text", "doc_id", live, "dead-run", 0L, failAt = "half-moved")
    }
    val e = intercept[IllegalArgumentException] {
      Bundles.importBundle(spark, bundle, live, overwrite = true)
    }
    assert(e.getMessage.contains("torn append"), s"$e")
    IndexLifecycle.abandonTornAppends(spark, live)
    Bundles.importBundle(spark, bundle, live, overwrite = true)
    assert(bm25(live) == bm25(src))
  }

  test("pinned-version export refuses a missing version; bundle paths are " +
       "write-once; pointer-family mixing is refused") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val src = tmp("graft-bmisc") + "/idx"
    TermStats.buildTextIndex(docs, "text", "doc_id", src)
    intercept[IllegalArgumentException] {
      Bundles.exportBundle(spark, src, tmp("graft-bdl7") + "/b",
        version = Some(99L))
    }
    val b = tmp("graft-bdl8") + "/b"
    Bundles.exportBundle(spark, src, b)
    intercept[IllegalArgumentException] {
      Bundles.exportBundle(spark, src, b) // write-once
    }
    // a _current-family bundle cannot land on a _latest-family artifact
    val snap = tmp("graft-bsnap2") + "/snap"
    Snapshots.commit(Seq((1L, "x")).toDF("k", "v"), snap)
    val e = intercept[IllegalArgumentException] {
      Bundles.importBundle(spark, b, snap, overwrite = true)
    }
    assert(e.getMessage.contains("family"))
  }

  test("CHAINED imports: one legacy (inventory-less) import in the chain " +
       "poisons completeness forever — a later complete import cannot " +
       "launder it back — while the blocked-run set keeps accumulating; " +
       "tmp debris alone does NOT force incompleteness") {
    def mkSrc(prefix: String, run: String): String = {
      val src = tmp(prefix) + "/idx"
      TermStats.buildTextIndex(
        Seq((1L, "a b a c"), (2L, "a c c")).toDF("doc_id", "text"),
        "text", "doc_id", src)
      assert(TermStats.appendTextIndexOnce(
        Seq((3L, "d d b")).toDF("doc_id", "text"),
        "text", "doc_id", src, run, 0L))
      src
    }
    def stripInventory(bundle: String): Unit = {
      val mf = java.nio.file.Paths.get(bundle, "_manifest")
      val legacy = java.nio.file.Files.readAllLines(mf).toArray
        .map(_.toString)
        .filterNot(l => l.startsWith("runs=") || l.startsWith("run="))
      java.nio.file.Files.write(mf, legacy.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(bundle, "._manifest.crc"))
    }
    def manifestRunsLine(bundle: String): String =
      java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(bundle, "_manifest")).toArray
        .map(_.toString).find(_.startsWith("runs=")).getOrElse("<none>")

    // crashed-writeAtomic tmp debris beside a healthy marker must NOT
    // read as a corrupt marker: the inventory stays complete
    val src1 = mkSrc("graft-bchain-s1", "r1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src1, "_appends", "run-00000000.tmp.dead"),
      Array.empty[Byte])
    val b1 = tmp("graft-bchain-b1") + "/b"
    Bundles.exportBundle(spark, src1, b1)
    assert(manifestRunsLine(b1) == "runs=complete",
      "tmp debris alone must not poison the inventory")

    val b2 = tmp("graft-bchain-b2") + "/b"
    Bundles.exportBundle(spark, mkSrc("graft-bchain-s2", "r2"), b2)
    stripInventory(b2) // the pre-r16 legacy bundle in the middle
    val b3 = tmp("graft-bchain-b3") + "/b"
    Bundles.exportBundle(spark, mkSrc("graft-bchain-s3", "r3"), b3)

    val target = tmp("graft-bchain-t") + "/idx"
    Bundles.importBundle(spark, b1, target)                    // complete
    // complete chain so far: a fresh run skipping early batches proceeds
    assert(TermStats.appendTextIndexOnce(
      Seq((6L, "x y")).toDF("doc_id", "text"),
      "text", "doc_id", target, "fresh-a", 1L))
    Bundles.importBundle(spark, b2, target, overwrite = true)  // INCOMPLETE
    Bundles.importBundle(spark, b3, target, overwrite = true)  // complete
    // the middle legacy import lost r2's identity — a later complete
    // import must NOT restore the complete flag (r2 would slip through
    // at batch 0); the strict mid-stream heuristic stays on
    val eH = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(
        Seq((4L, "b c d")).toDF("doc_id", "text"),
        "text", "doc_id", target, "never-seen-run", 2L)
    }
    assert(eH.getMessage.contains("incomplete old-run inventory"), s"$eH")
    // the blocked set still ACCUMULATED across all three imports: r1
    // (gen-1 inventory), fresh-a (the target's own pre-import-2 marker),
    // and r3 are refused even at batch 0
    Seq("r1", "fresh-a", "r3").foreach { run =>
      val e = intercept[IllegalStateException] {
        TermStats.appendTextIndexOnce(
          Seq((5L, "e f")).toDF("doc_id", "text"),
          "text", "doc_id", target, run, 0L)
      }
      assert(e.getMessage.contains("FRESH checkpoint"), s"$run: $e")
    }
    // and a re-export of the poisoned target says so
    val b4 = tmp("graft-bchain-b4") + "/b"
    Bundles.exportBundle(spark, target, b4)
    assert(manifestRunsLine(b4) == "runs=incomplete",
      "re-export must surface the chain's lost completeness")
  }
}
