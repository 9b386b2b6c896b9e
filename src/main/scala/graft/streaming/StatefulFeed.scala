package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Bounded-state SubscribeToEvents: the state-store form of the change feed
 * (reference: proto/hydraide.proto:755-801 — every write emits
 * NEW/MODIFIED/DELETED with the old value, FIFO per key).
 *
 * `flatMapGroupsWithState` keeps ONE entry per live key in Spark's
 * checkpointed state store (bounded, spillable, fault-tolerant) — unlike a
 * driver-held snapshot DataFrame, this survives restarts and scales with
 * executor count. Per-key FIFO is explicit: commands inside a micro-batch
 * are replayed in `seq` order, so correctness does not depend on partition
 * layout. Every state transition emits its event (not just the batch-final
 * one), matching the reference's per-write notification.
 *
 * Exactly-once under at-least-once replay: a delete stores a TOMBSTONE
 * (`KV(null, seq)`) instead of dropping the state, so a redelivered older
 * upsert can never resurrect a deleted key and re-emit NEW. Tombstones can
 * be garbage-collected via an opt-in processing-time TTL sized to the
 * source's replay window; the default keeps them (state grows with the
 * number of DELETED keys, not with traffic). The TTL is opt-in because
 * ProcessingTimeTimeout makes the engine consider every batch as possibly
 * having work (`FlatMapGroupsWithStateExec.shouldRunAnotherBatch` == true),
 * i.e. the query runs continuous no-data batches — correct, but a
 * throughput/test-harness tradeoff the caller should make explicitly.
 */
object StatefulFeed {

  /** An upsert/delete command. `seq` must be monotone per key. */
  final case class Command(key: String, seq: Long, op: String, value: String)

  /** Stored per-key state; `value == null` marks a delete tombstone. */
  final case class KV(value: String, seq: Long)

  /** Emitted change event (old_value NULL for NEW, value NULL for DELETED). */
  final case class Change(key: String, seq: Long, _status: String,
                          value: String, old_value: String)

  implicit private val kvEnc: Encoder[KV] = Encoders.product[KV]
  implicit private val changeEnc: Encoder[Change] = Encoders.product[Change]
  implicit private val strEnc: Encoder[String] = Encoders.STRING

  /**
   * The shared per-key replay kernel — ONE implementation behind both
   * state-store forms ([[changeFeed]] / [[changeFeedTws]]), so the two
   * APIs cannot drift. Replays `cmds` in sequence order against `cur0`
   * and returns (final state, events in emit order).
   */
  private[streaming] def replay(key: String, cmds: Iterator[Command],
                                cur0: Option[KV]): (Option[KV], Seq[Change]) = {
    var cur = cur0
    val out = scala.collection.mutable.ArrayBuffer.empty[Change]
    // replay in sequence order; drop commands at-or-before the stored
    // seq — a live value AND a tombstone both filter stale replays
    cmds.toSeq.sortBy(_.seq)
      .filter(c => cur.forall(_.seq < c.seq))
      .foreach { c =>
        (c.op, cur) match {
          // null is the tombstone SENTINEL, not a storable value: a
          // null-valued upsert stored as KV(null, seq) would forge a
          // tombstone — the next upsert would emit NEW instead of
          // MODIFIED and an interleaved delete would emit nothing.
          // Dropped with no event and no state advance ("store
          // nothing" has no other coherent meaning here); encode an
          // empty payload as "" if callers need one.
          case ("U", _) if c.value == null => ()
          case ("U", None) =>
            cur = Some(KV(c.value, c.seq))
            out += Change(key, c.seq, ChangeFeed.New, c.value, null)
          case ("U", Some(p)) if p.seq >= c.seq => () // stale replay
          case ("U", Some(p)) if p.value == null =>   // past tombstone
            cur = Some(KV(c.value, c.seq))
            out += Change(key, c.seq, ChangeFeed.New, c.value, null)
          case ("U", Some(p)) =>
            cur = Some(KV(c.value, c.seq))
            if (p.value != c.value)
              out += Change(key, c.seq, ChangeFeed.Modified, c.value, p.value)
          case ("D", Some(p)) if p.seq < c.seq && p.value != null =>
            cur = Some(KV(null, c.seq)) // tombstone, not removal
            out += Change(key, c.seq, ChangeFeed.Deleted, null, p.value)
          case ("D", Some(p)) if p.seq < c.seq =>
            cur = Some(KV(null, c.seq)) // advance tombstone seq, no event
          case ("D", None) =>
            // tombstone even when the key was never seen: the delete's
            // older companion upsert may land on a DIFFERENT source
            // partition and arrive in a LATER batch — without the
            // tombstone that stale U(seq<this) would match ("U", None)
            // and resurrect the key, violating the class invariant.
            // No event: nothing visible was deleted.
            cur = Some(KV(null, c.seq))
          case _ => () // stale delete: no event
        }
      }
    (cur, out.toSeq)
  }

  def changeFeed(commands: Dataset[Command],
                 tombstoneTtl: Option[String] = None): Dataset[Change] =
    commands
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        if (tombstoneTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: String, cmds: Iterator[Command], state: GroupState[KV]) =>
          if (state.hasTimedOut) {
            // only tombstones arm a timeout: the replay window has passed,
            // the guard is no longer needed
            state.remove()
            Iterator.empty
          } else {
            val (cur, out) = replay(key, cmds, state.getOption)
            cur match {
              case Some(kv) =>
                state.update(kv)
                if (kv.value == null) tombstoneTtl.foreach(state.setTimeoutDuration)
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }

  /**
   * [[changeFeed]] on the arbitrary-state v2 API (`transformWithState`,
   * Spark 4): same [[replay]] kernel, state in a named `ValueState[KV]`
   * slot, tombstone GC via a processing-time TIMER instead of the v1
   * group timeout — the timer clears the state only if it still holds a
   * tombstone when it fires (a live value written meanwhile must survive).
   * Requires the RocksDB state store provider
   * (`spark.sql.streaming.stateStore.providerClass`), which is also the
   * production-scale store: checkpointed, spillable, per-key.
   *
   * Event-for-event equal to [[changeFeed]] (StreamingSpec-pinned).
   */
  def changeFeedTws(commands: Dataset[Command],
                    tombstoneTtl: Option[String] = None): Dataset[Change] = {
    val ttlMs = tombstoneTtl.map(s =>
      scala.concurrent.duration.Duration(s).toMillis)
    commands
      .groupByKey(_.key)
      .transformWithState(new FeedProcessor(ttlMs),
        if (ttlMs.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append)
  }

  /** The [[changeFeedTws]] stateful processor — kept a top-level class so
    * its checkpointed state schema is stable across callers. */
  private class FeedProcessor(tombstoneTtlMs: Option[Long])
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Command, Change] {
    @transient private var kv: org.apache.spark.sql.streaming.ValueState[KV] = _
    // processing-time ms when the CURRENT tombstone was armed — timers are
    // fire-and-forget, so a key tombstoned, revived, and tombstoned again
    // still has the FIRST timer pending; an expiry may only clear state
    // once the LATEST tombstone's own TTL has fully elapsed, or a stale
    // timer would GC a younger tombstone early and let a replayed old
    // upsert resurrect the key (the exactly-once violation the tombstone
    // exists to prevent)
    @transient private var tombstonedAt: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      kv = getHandle.getValueState[KV]("kv", kvEnc,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      if (tombstoneTtlMs.isDefined)
        tombstonedAt = getHandle.getValueState[Long]("tombstonedAt",
          Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Command],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[Change] = {
      val (cur, out) = replay(key,
        rows, if (kv.exists()) Some(kv.get()) else None)
      cur.foreach { s =>
        kv.update(s)
        tombstoneTtlMs.foreach { ttl =>
          if (s.value == null) {
            val now = timers.getCurrentProcessingTimeInMs
            tombstonedAt.update(now)
            getHandle.registerTimer(now + ttl)
          } else if (tombstonedAt.exists()) tombstonedAt.clear()
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String,
        timers: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Change] = {
      // clear ONLY a tombstone whose OWN ttl elapsed: a stale timer from an
      // earlier tombstone (or one armed before a revive) must be a no-op —
      // the latest tombstone's own timer will do the GC at the right time
      val expired = tombstoneTtlMs.exists(ttl =>
        kv.exists() && kv.get().value == null &&
          tombstonedAt.exists() &&
          timers.getCurrentProcessingTimeInMs >= tombstonedAt.get() + ttl)
      if (expired) { kv.clear(); tombstonedAt.clear() }
      Iterator.empty
    }
  }

  /**
   * Per-EVENT delivery — the queue-consumer shape of the reference's
   * SubscribeToEvents gRPC stream (one push per write,
   * proto/hydraide.proto:755-801): every [[Change]] row is handed to
   * `onEvent` individually as its partition is processed, under
   * `Trigger.ProcessingTime(0)` so the next micro-batch plans as soon as
   * the previous commits. Latency is therefore one batch cycle — measured
   * (graft.LatencyProbe, local[8], unloaded worst case: every write waits
   * out the in-flight batch) p50 ≈ 197 ms / p95 ≈ 279 ms event→delivery,
   * the documented engine floor vs the reference's µs in-process push
   * (BENCH_NOTES r14); a loaded feed amortizes the cycle over the whole
   * micro-batch, so per-event OVERHEAD falls with throughput even though
   * the floor stands;
   * ORDER is exact: a key's events all come from its state-store
   * partition and emit in seq order, so per-key delivery order equals
   * write order across batches (StreamingSpec-pinned).
   *
   * `onEvent` runs on executors — it must be serializable and idempotent
   * (at-least-once on failure replay, the foreachBatch contract).
   */
  def subscribe(feed: Dataset[Change],
                onEvent: Change => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Change] =
    feed.writeStream
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreach(new org.apache.spark.sql.ForeachWriter[Change] {
        override def open(partitionId: Long, epochId: Long): Boolean = true
        override def process(c: Change): Unit = onEvent(c)
        override def close(errorOrNull: Throwable): Unit = ()
      })
}
