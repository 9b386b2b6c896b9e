package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/**
 * Structured Streaming surfaces for the reference's reactive features:
 * SubscribeToEvents (change feed), SubscribeToInfo (live counts), TTL
 * expiration with watermarks, and windowed aggregation — the capabilities
 * HydrAIDE exposes over gRPC streams (reference: proto/hydraide.proto:
 * 363-395, 735-801) re-expressed as streaming queries.
 */
object Streams {

  /**
   * SubscribeToEvents: treat the incoming stream as an upsert/delete command
   * log (`op` column: U/D) and emit CDC events per micro-batch against a
   * driver-held state snapshot (foreachBatch). The sink receives exactly the
   * reference's event rows: key, status NEW/MODIFIED/DELETED, new + old.
   *
   * `seqCol` is the command order: per-key last-write-wins picks the highest
   * sequence, so ordering is correct however the micro-batch is partitioned
   * (a position-derived order like monotonically_increasing_id encodes
   * (partition, offset) and is arbitrary across partitions — the round-1
   * bug). Producers always have one: a log offset, a commit LSN, an ingest
   * timestamp.
   *
   * State is per-query and in-memory here, fine for demos; the BOUNDED form
   * is [[StatefulFeed.changeFeed]] (state-store backed, per-key), or a Delta
   * MERGE inside the same foreachBatch — semantics identical.
   */
  def subscribeToEvents(
      commands: DataFrame,          // streaming: op STRING, seq, key, value cols...
      keyCol: String,
      seqCol: String,
      onEvents: DataFrame => Unit): DataStreamWriter[Row] = {
    var state: Option[DataFrame] = None
    commands.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val dataCols = batch.columns.filter(c => c != "op" && c != seqCol).toSeq
        val cur = state.getOrElse(
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
            batch.drop("op", seqCol).schema))
        // Null-key commands are unaddressable (the engine-wide probe
        // discipline): they can never match the anti-join OR the diff's
        // presence checks, so without this strip each batch would append
        // one more NULL-key row to state FOREVER while never emitting an
        // event for it. An unknown op is refused loudly in the plan: the
        // anti-join removes every touched key and only "U" rows re-enter,
        // so a malformed op ("u", "UPSERT") would silently DELETE live
        // state and emit a spurious DELETED event.
        val checked = batch.filter(col(keyCol).isNotNull)
          .withColumn("op", when(col("op").isin("U", "D"), col("op"))
            .otherwise(raise_error(concat(
              lit("unknown command op '"), col("op"),
              lit("' — expected U (upsert) or D (delete)")))))
        // last command per key wins inside one batch (FIFO per key by seq)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
        val lastPerKey = checked.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn", seqCol)
        val upserts = lastPerKey.filter(col("op") === "U").select(dataCols.map(col): _*)
        // (deletes need no separate frame: the left_anti below removes every
        // touched key, and only upserts re-enter)
        val next = cur
          .join(lastPerKey.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(upserts)
          .localCheckpoint(true) // cut lineage growth across batches
        val events = ChangeFeed.diff(cur, next, keyCol)
        // deliver BEFORE advancing the snapshot: if the sink throws, the
        // query fails with `state` still at `cur`, and the checkpoint
        // replay re-diffs the same batch — at-least-once (duplicates on
        // retry). Advancing first would make the replay diff the post-batch
        // state against itself and silently drop the failed batch's events.
        onEvents(events)
        state = Some(next)
      }
  }

  /** Stream-static enrichment: each streaming event joins a broadcast
    * static dimension — the subscribe-then-GetByKeys composition clients of
    * the reference do in application code, fused into the stream. The dim
    * is broadcast so the stream never shuffles.
    *
    * SIZE CONTRACT: `dim` must be a dimension table in the broadcast sense
    * — executor-memory scale (at most a few hundred MB serialized), NOT a
    * second fact table. The forced hint re-ships it to every executor per
    * micro-batch, so its cost is `batches × executors × size`; past the
    * contract, drop the hint and pre-shuffle both sides on `on` (or probe
    * with [[graft.operators.KeyProbe.semiJoin]]'s bloom regime) — the same
    * regime discipline the batch-side contamination/probe operators apply.
    * The hint stays unconditional HERE because a streaming micro-batch
    * cannot afford a per-batch size probe and the reference composition
    * this fuses (GetByKeys against a profile swamp) is dimension-shaped by
    * construction. */
  def enrich(stream: DataFrame, dim: DataFrame, on: Seq[String]): DataFrame =
    stream.join(broadcast(dim), on, "left_outer")

  /**
   * Stream-stream interval join — correlate two live feeds (the
   * impression/click, command/ack shape) where the right event must land
   * within `[leftTs, leftTs + within]` of its left partner. Both sides
   * carry watermarks, and the join condition is time-bounded in BOTH
   * directions, which is exactly what lets Structured Streaming evict
   * state: a left row older than watermark+within can never match again
   * and is dropped from the state store — state stays proportional to the
   * in-flight window, not the stream history. Inner join: matches emit as
   * soon as both sides arrive (no watermark wait).
   *
   * Column names must be disjoint apart from `key` (the usual discipline
   * for stream-stream joins); output carries left columns then right.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, within: String,
                   watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND r.$rightTs >= l.$leftTs AND " +
      s"r.$rightTs <= l.$leftTs + interval $within"))
      .drop(r(key))
  }

  /** SubscribeToInfo: live per-source row counts, update mode. */
  def subscribeToInfo(events: DataFrame, groupCol: String): DataFrame =
    events.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))

  /** TTL expiration in event time (beacon ExpiredAt semantics,
    * proto:986-1001, moved onto watermarks). TWO distinct effects, be
    * precise about which applies: (1) the WATERMARK makes downstream
    * STATEFUL operators (windows, dedup, joins) drop rows arriving more
    * than `ttl` behind the observed max event time — that is late-DATA
    * eviction relative to stream progress, and it is all a map-only
    * pipeline gets from this call; (2) the `_expires_at` column is each
    * row's own absolute expiry instant, exposed for sinks and batch
    * readers to filter on (`_expires_at <= now`), which is the per-row
    * TTL semantics — this helper deliberately does not apply that filter
    * itself, because "now" in a deterministic pipeline is the CALLER's
    * replay-stable reference instant, not a wall clock read mid-plan. */
  def withTtl(stream: DataFrame, tsCol: String, ttl: String): DataFrame =
    stream
      .withWatermark(tsCol, ttl)
      .withColumn("_expires_at", col(tsCol) + expr(s"INTERVAL $ttl"))

  /** Streaming exact dedup — the continuous-ingest form of
    * `Dedup.exact`: keep the FIRST arrival of each key (e.g. a document
    * digest) across micro-batches, with state bounded by the watermark.
    * `dropDuplicatesWithinWatermark` evicts a key's dedup state once the
    * watermark passes its event time + delay, so the state store holds
    * only the dedup horizon (vs plain `dropDuplicates`, whose streaming
    * state grows without bound — unusable for a perpetual crawl feed).
    * The tradeoff is explicit: a duplicate arriving later than the
    * watermark delay is treated as new; size the delay to the crawl
    * re-fetch horizon and let the batch dedup sweep the long tail. */
  def dedupStream(stream: DataFrame, keyCol: String, tsCol: String,
                  watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Tumbling-window aggregation with watermarking. `valueCol` names the
    * measure to sum (previously hardcoded — a generic tsCol/groupCol API
    * must not smuggle in a schema requirement). */
  def windowedCounts(stream: DataFrame, tsCol: String, groupCol: String,
                     windowLen: String, watermark: String,
                     valueCol: String = "value"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(groupCol))
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("val"))
      .select(col("window.start").as("window_start"), col(groupCol),
        col("n"), col("val"))

  /** Streaming sessionization: per-key session windows that close `gap`
    * after the last event — the continuous form of the batch
    * `Sessionize` operator (same [start, end) boundary rule). A session's
    * state lives until the watermark passes its end + gap, then the
    * session emits once, complete — so downstream sees only FINAL
    * sessions and state is bounded by the number of OPEN sessions. */
  def sessionCounts(stream: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))
}
