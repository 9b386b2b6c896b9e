package graft

import graft.operators.IndexLifecycle
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Global per-(op, protocol-area) counters for [[CountingRawFs]] — the
  * census ledger behind the appendOnce file-op budget law (BENCH_NOTES).
  * Areas: "appends" (`/_appends` — pure protocol overhead), "staging",
  * "live" (everything else under the artifact). */
object FsOpCensus {
  val counts = new ConcurrentHashMap[String, AtomicInteger]()
  def record(op: String, p: org.apache.hadoop.fs.Path): Unit = {
    val s = p.toUri.getPath
    val area =
      if (s.contains("/_appends")) "appends"
      else if (s.contains("/_staging")) "staging"
      else "live"
    counts.computeIfAbsent(s"$area:$op", _ => new AtomicInteger).incrementAndGet()
    ()
  }
  def reset(): Unit = counts.clear()
  def snapshot(): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.map { case (k, v) => k -> v.get() }.toMap
  }
}

/** A RawLocalFileSystem under the `cfile://` scheme that counts every
  * metadata/data operation — object-store round trips made visible, so
  * the replay-protocol's per-batch overhead is a pinned census instead
  * of a guess. Raw (no checksum shadow files) keeps counts exact. */
class CountingRawFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "cfile"
  override def getUri: java.net.URI = java.net.URI.create("cfile:///")
  override def open(f: org.apache.hadoop.fs.Path, b: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    FsOpCensus.record("open", f); super.open(f, b)
  }
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    FsOpCensus.record("create", f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    FsOpCensus.record("rename", src); super.rename(src, dst)
  }
  override def delete(p: org.apache.hadoop.fs.Path,
                      recursive: Boolean): Boolean = {
    FsOpCensus.record("delete", p); super.delete(p, recursive)
  }
  override def listStatus(p: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    FsOpCensus.record("list", p); super.listStatus(p)
  }
  override def getFileStatus(p: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = {
    FsOpCensus.record("stat", p); super.getFileStatus(p)
  }
  override def mkdirs(p: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission): Boolean = {
    FsOpCensus.record("mkdirs", p); super.mkdirs(p, permission)
  }
}

/** `cfile://` binding for the FileContext API (writeAtomic's atomic
  * rename rides FileContext, which resolves AbstractFileSystem, not
  * FileSystem) — delegates to the same counting impl. */
class CountingAbstractFs(uri: java.net.URI,
                         conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, {
      val f = new CountingRawFs
      f.setConf(conf)
      f
    }, conf, "cfile", false)

/**
 * The appendOnce PROTOCOL-overhead census: how many object-store round
 * trips one steady-state micro-batch pays on `_appends` beyond its data
 * writes — pinned exactly, so artifact maintenance at high batch rates
 * has a stated budget (BENCH_NOTES law) and any protocol edit that adds
 * round trips shows up as a failing number, not a guess.
 */
class FsOpCensusSpec extends SparkSpec {
  import spark.implicits._

  test("steady-state appendOnce pays a PINNED _appends op budget per " +
       "batch: one listing, three small reads (marker + two fence " +
       "checks), two atomic writes (intent, marker), one intent delete " +
       "— identical across batches") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.cfile.impl", classOf[CountingRawFs].getName)
    conf.set("fs.AbstractFileSystem.cfile.impl",
      classOf[CountingAbstractFs].getName)
    val local = java.nio.file.Files
      .createTempDirectory("graft-fsop-census").toString
    val root = s"cfile://$local/art"

    Seq((1L, "seed")).toDF("id", "txt")
      .write.parquet(s"$root/v=1/rows")
    IndexLifecycle.flipPointer(spark, root, 1L)
    def stage(rows: Seq[(Long, String)])(staging: String): Unit =
      rows.toDF("id", "txt").write.mode("overwrite")
        .parquet(s"$staging/rows")

    // batch 0 creates _appends (non-steady); batches 1+ are the regime
    // a long-lived maintaining stream pays forever
    assert(IndexLifecycle.appendOnce(spark, root, "census-run", 0L)(
      stage(Seq((2L, "b0")))))
    def censusOf(batchId: Long): Map[String, Int] = {
      FsOpCensus.reset()
      assert(IndexLifecycle.appendOnce(spark, root, "census-run", batchId)(
        stage(Seq((batchId + 10, s"b$batchId")))))
      FsOpCensus.snapshot()
    }
    val b1 = censusOf(1L)
    val b2 = censusOf(2L)
    val appends1 = b1.filter(_._1.startsWith("appends:"))
    val appends2 = b2.filter(_._1.startsWith("appends:"))
    info(s"per-batch _appends ops: $appends1")
    info(s"staging/live ops b1: ${b1.filterNot(_._1.startsWith("appends:"))}")
    assert(appends1 == appends2,
      s"the protocol census must be deterministic across batches: " +
        s"$appends1 vs $appends2")

    // THE LAW (BENCH_NOTES): the exact steady-state budget of PORTABLE
    // ops — the round trips an object store would also pay. (RawLocalFS
    // implements create via an internal overload and pads rename/create
    // with extra getFileStatus probes, so `create` is not separately
    // countable and `stat` is bounded, not pinned.) Any protocol edit
    // that moves these numbers must update the law knowingly.
    assert(appends1.getOrElse("appends:list", 0) == 1,
      s"ONE opening listing per batch — both atomic writes sweep debris " +
        s"from it instead of re-listing: $appends1")
    assert(appends1.getOrElse("appends:open", 0) == 3,
      s"marker read + two abandon-fence checks: $appends1")
    assert(appends1.getOrElse("appends:rename", 0) == 2,
      s"two atomic-write renames (intent, marker): $appends1")
    assert(appends1.getOrElse("appends:delete", 0) == 2,
      s"intent cleanup + the FileContext overwrite-rename's delete of " +
        s"the previous marker: $appends1")
    assert(appends1.getOrElse("appends:stat", 0) <= 15,
      s"stat bound blown (RawLocalFS internals pad this; the portable " +
        s"protocol-authored stats are 2): $appends1")
    val core = Seq("list", "open", "rename", "delete")
      .map(op => appends1.getOrElse(s"appends:$op", 0)).sum
    assert(core == 8, s"core _appends round-trip budget moved: $appends1")

    // the replay NO-OP pays even less — the guard must stay cheap (it
    // runs on every redelivery): one listing + one marker read + the
    // fence-0 names check, plus idempotent cleanup deletes
    FsOpCensus.reset()
    assert(!IndexLifecycle.appendOnce(spark, root, "census-run", 2L)(
      stage(Seq((99L, "replay")))))
    val noop = FsOpCensus.snapshot().filter(_._1.startsWith("appends:"))
    info(s"replay no-op _appends ops: $noop")
    assert(noop.getOrElse("appends:create", 0) == 0 &&
      noop.getOrElse("appends:rename", 0) == 0,
      s"a no-op must write nothing under _appends: $noop")
    assert(noop.values.sum <= 8, s"no-op budget blown: $noop")
  }
}
