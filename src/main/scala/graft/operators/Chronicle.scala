package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch last-write-wins rebuild + compaction over an append-only command
 * log — the chronicler-reader semantics (reference:
 * app/core/hydra/swamp/chronicler/v2/reader.go:1-325 rebuilds current state
 * by replaying the log last-write-wins per key; compactor.go:1-361 rewrites
 * the log down to that state).
 *
 * Spark form: one window shuffle on the key; `row_number() = 1` over
 * (seq DESC) picks each key's final command; keys whose final command is a
 * delete are dropped. The sequence column must be a total order of the log
 * (file offset, commit version, ingest timestamp) — per-key ordering is all
 * that matters, so any monotone-per-key column works. At 100 TB this is a
 * single hash-partition-by-key pass, the same shape as the reference's
 * per-swamp replay but parallel over all swamps at once.
 *
 * Form adjudicated by isolated A/B at sf0.1 (identical single-query
 * harness, min of two): window exchange+sort 1.09 s;
 * `max(seq) groupBy key` + semi-join back (keys-only first shuffle, extra
 * stage) 1.12 s; `max_by(struct(cols), seq)` (map-side combinable, but
 * builds+copies a full-row struct per input row) 1.36 s. The window wins
 * whenever per-key log depth is moderate — the command-log shape, where
 * keys number in the millions and each has tens of entries. A
 * pathologically hot key (one key owning a whole partition's worth of
 * entries) would favor the max_by form; callers with that shape can
 * pre-aggregate, but it is not the log shape the chronicler produces.
 */
object Chronicle {

  /**
   * Current state from a command log: latest entry per `keyCol` by `seqCol`;
   * keys whose latest `opCol` equals `deleteOp` are gone. Output columns =
   * the log's data columns (op/seq retained for provenance-free callers to
   * drop).
   */
  def lastWriteWins(log: DataFrame, keyCol: String, seqCol: String,
                    opCol: String, deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    log.withColumn("_rn", row_number().over(w))
      // null-safe delete test: a NULL op (an upsert that never set it, one
      // malformed record) fails `=!=` into NULL and the filter would erase
      // the key as if it were a delete — and compact() would make that
      // erasure permanent. Only an EXPLICIT deleteOp tombstones.
      .filter(col("_rn") === 1 && !(col(opCol) <=> deleteOp))
      .drop("_rn")
  }

  /** State as of a log position: replay only entries with `seqCol` ≤
    * `asOfSeq` — the chronicler's rebuild-to-any-offset semantic (an
    * append-only log IS a full history; cutting the replay at a sequence
    * point is time travel for free). Same single-window plan as
    * [[lastWriteWins]], with the seq bound pushed into the scan. */
  def stateAsOf(log: DataFrame, keyCol: String, seqCol: String,
                opCol: String, asOfSeq: Long,
                deleteOp: String = "D"): DataFrame =
    lastWriteWins(log.filter(col(seqCol) <= asOfSeq),
      keyCol, seqCol, opCol, deleteOp)

  /** Compaction (`OPTIMIZE`-style rewrite): write the log's LWW state to
    * `outPath` — a NEW path (the compactGramIndex discipline), enforced:
    * compacting onto the path being read either throws Spark's
    * self-overwrite error mid-write or tears the log on a crash between
    * delete and write, and an existing unrelated dir must not be
    * clobbered. Swap the reader to the compacted path once written (or
    * stage under an IndexLifecycle-versioned root for pointer-flip
    * semantics). */
  def compact(log: DataFrame, keyCol: String, seqCol: String, opCol: String,
              outPath: String, deleteOp: String = "D"): Unit = {
    val spark = log.sparkSession
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(p) || fs.listStatus(p).isEmpty,
      s"compact target $outPath already holds data — compaction writes a " +
        "NEW log (in-place overwrite would tear the log it is reading); " +
        "compact to a fresh path and swap readers over")
    lastWriteWins(log, keyCol, seqCol, opCol, deleteOp)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Log-integrity audit: per-key holes in the sequence — one row per gap
    * `(key, gap_after, resumes_at)` where `resumes_at > gap_after + 1`.
    * A chronicle's per-key seq should be dense; a hole means a lost write
    * (the failure a durable log exists to make detectable). Same single
    * key-partitioned window as the LWW rebuild — audit and rebuild can
    * share one shuffle in a combined pass. */
  def seqGaps(log: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    log.select(col(keyCol), col(seqCol))
      .withColumn("_next", lead(col(seqCol), 1).over(w))
      .filter(col("_next") > col(seqCol) + 1)
      .select(col(keyCol), col(seqCol).as("gap_after"),
        col("_next").as("resumes_at"))
  }
}
