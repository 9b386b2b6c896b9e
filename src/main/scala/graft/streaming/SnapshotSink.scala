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
 * Exactly-once mechanics (the Delta txnAppId/txnVersion pattern): the
 * sink records (runId, batchId) in the version's metadata, which
 * [[Snapshots.commitIf]] makes visible atomically with the version
 * rename. A replayed batch of the SAME run sees `lastBatchId >= batchId`
 * and skips — and because batchIds restart at 0 when a query is
 * redeployed with a fresh checkpoint, the skip check is scoped to the
 * runId: a new run never mistakes the old run's high batchId for its
 * own progress (that mistake silently discards data). The high-water
 * mark is read via [[Snapshots.latestMetaValue]], so an interleaved
 * maintenance commit without sink metadata cannot erase replay
 * protection either.
 *
 * Single-writer per table is assumed (one streaming query per snapshot
 * dir) — the same per-swamp single-writer model as the reference; the
 * underlying CAS re-merges against the fresh version on conflict rather
 * than clobbering a concurrent commit.
 */
object SnapshotSink {

  private val RunKey = "stream.runId"
  private val BatchKey = "stream.batchId"

  /** Last (runId, batchId) merged into the table — both read from the SAME
    * version's metadata (a pair stitched from two versions could combine one
    * commit's runId with another's batchId). */
  def lastCommitted(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Option[(String, Long)] =
    Snapshots.latestMetaValues(spark, dir, Seq(RunKey, BatchKey))
      .map(m => (m(RunKey), m(BatchKey).toLong))

  /**
   * The foreachBatch body: `stream.writeStream.foreachBatch(
   * SnapshotSink.mergeBatch(dir, keyCol, runId))`. `runId` identifies
   * this deployment of the query and MUST be restart-stable — use the
   * checkpoint path or `query.id` (stable across restarts from the same
   * checkpoint, the Delta txnAppId analogue). Do NOT use `query.runId`:
   * Spark assigns a fresh runId on every restart while batchIds continue,
   * which disables the replay guard in exactly the crash-restart-replay
   * case it exists for. BatchIds are only compared within one runId.
   * Applies the [[Mutations.set]] matrix (default Upsert) of the
   * micro-batch against the latest snapshot and commits the post-state
   * as the next version; replayed batchIds of the same run are no-ops.
   *
   * A micro-batch with SEVERAL rows per key (an insert then an update of
   * the same key in one trigger — routine for a CDC-shaped stream) must
   * pass `seqCol` so the latest row per key wins; without it the merge
   * join would multiply the duplicates into the table (mergeCommit's
   * delta key contract). Use the stream's event seq / offset column.
   */
  def mergeBatch(dir: String, keyCol: String, runId: String,
                 mode: Mutations.WriteMode = Mutations.Upsert,
                 seqCol: Option[String] = None)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    lastCommitted(spark, dir) match {
      case Some((run, last)) if run == runId && last >= batchId => // replay
      case _ if batch.isEmpty =>
        // no-data micro-batch (recovery batch, a multi-source trigger where
        // only the other source advanced): merging nothing would still
        // REWRITE the full base into a new version + pointer bump, purely
        // to record the batchId. Skip the commit; replaying an empty batch
        // later is inherently idempotent, so the unrecorded id loses
        // nothing. isEmpty costs a limit-1 probe — base-size cheaper.
      case _ =>
        Snapshots.mergeCommit(spark, dir, batch, keyCol, mode,
          meta = Map(RunKey -> runId, BatchKey -> batchId.toString),
          dedupSeqCol = seqCol)
    }
  }
}
