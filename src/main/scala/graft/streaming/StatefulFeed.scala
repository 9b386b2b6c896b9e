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
            var cur = state.getOption
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
            cur match {
              case Some(kv) =>
                state.update(kv)
                if (kv.value == null) tombstoneTtl.foreach(state.setTimeoutDuration)
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
}
