package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.{Mutations, Snapshots}

/**
 * Streaming write-back: merge each micro-batch into a [[Snapshots]]
 * versioned table with EXACTLY-ONCE effect under replay — the closing arc
 * of the reference's reactive loop (write → Subscribe event → durable
 * state; reference: proto/hydraide.proto:755-801 events feed downstream
 * state, chronicler persists it).
 *
 * Exactly-once mechanics: Structured Streaming's foreachBatch is
 * AT-LEAST-ONCE (a batch can be re-run after a failure with the same
 * batchId), so the sink records the batchId in the version's metadata —
 * which [[Snapshots.commitIf]] makes visible atomically with the version
 * rename. A replayed batch sees `lastBatchId >= batchId` on the CURRENT
 * version and skips; there is no window where the data committed but the
 * batchId did not.
 *
 * Single-writer per table is assumed (one streaming query per snapshot
 * dir) — the same per-swamp single-writer model as the reference; the
 * underlying CAS still detects an accidental second writer rather than
 * clobbering.
 */
object SnapshotSink {

  private val BatchKey = "stream.batchId"

  /** Last batchId merged into the table's current version, if any. */
  def lastBatchId(spark: org.apache.spark.sql.SparkSession, dir: String): Option[Long] =
    Snapshots.versionMeta(spark, dir).get(BatchKey).map(_.toLong)

  /**
   * The foreachBatch body: `stream.writeStream.foreachBatch(
   * SnapshotSink.mergeBatch(dir, keyCol))`. Applies the [[Mutations.set]]
   * matrix (default Upsert) of the micro-batch against the latest
   * snapshot and commits the post-state as the next version, tagged with
   * the batchId; replayed batchIds are no-ops.
   */
  def mergeBatch(dir: String, keyCol: String,
                 mode: Mutations.WriteMode = Mutations.Upsert)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (lastBatchId(spark, dir).exists(_ >= batchId)) return // replay: done
    Snapshots.mergeCommit(spark, dir, batch, keyCol, mode,
      meta = Map(BatchKey -> batchId.toString))
  }
}
