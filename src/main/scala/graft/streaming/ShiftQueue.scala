package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming shift queue — the stateful form of `ShiftExpiredTreasures`
 * (reference: proto/hydraide.proto:1109-1151; the batch form is
 * operators/Shift.scala): items enqueue with an expiry; a CLAIM command
 * atomically removes and emits up to `n` expired items, oldest expiry
 * first. Because all commands for one queue pass through that key's single
 * state-store entry, concurrent claimers get DISJOINT sets by construction
 * — the same guarantee the reference gets from its per-swamp lock, here
 * from per-key single-writer state.
 *
 * Commands (one Dataset, discriminated by `op`):
 *  - op = "E": enqueue (id, expireAtMs, value). FIRST enqueue wins while
 *    the id is pending: a re-enqueue of a pending id is consumed with no
 *    effect (no expiry/value update — mirroring the reference's insert-only
 *    treasure create; after the item is claimed, the id may enqueue anew).
 *    To mutate a pending item's lease, claim it and re-enqueue.
 *  - op = "C": claim up to `n` items with expireAtMs < nowMs
 *
 * Output: one row per claimed item, tagged with the claim's `claimId` so
 * each caller can collect exactly its own set.
 */
object ShiftQueue {

  final case class Cmd(queue: String, op: String, seq: Long,
                       id: String, expireAtMs: Long, value: String,
                       claimId: String, n: Int, nowMs: Long)

  object Cmd {
    def enqueue(queue: String, seq: Long, id: String,
                expireAtMs: Long, value: String): Cmd =
      Cmd(queue, "E", seq, id, expireAtMs, value, null, 0, 0L)
    def claim(queue: String, seq: Long, claimId: String, n: Int, nowMs: Long): Cmd =
      Cmd(queue, "C", seq, null, 0L, null, claimId, n, nowMs)
  }

  final case class Item(id: String, expireAtMs: Long, value: String)

  final case class Claimed(queue: String, claimId: String, id: String,
                           expireAtMs: Long, value: String)

  /**
   * State wrapper: the per-queue pending set plus the highest applied
   * command seq (public — the state-store encoder's generated code
   * constructs it reflectively).
   *
   * `lastSeq` is the redelivery guard for BOTH ops: an at-least-once
   * source replaying a claim must not drain the NEXT n items under a
   * stale claimId (the original items are long gone from state, so the
   * replay would silently delete unprocessed work), and an enqueue
   * replayed after its item was claimed must not resurrect it (the
   * pending-id dedup can't see claimed ids). Commands at-or-below the
   * high-water seq are skipped — the same discipline as
   * [[StatefulFeed]]/[[Anomaly]].
   *
   * Size envelope: the list is deserialized, scanned per claim (one
   * partition + sort of the expired side), and re-serialized once per
   * micro-batch that touches the queue — O(n log n) in PENDING items, not
   * in traffic (the per-enqueue id dedup checks a Set built once per
   * batch, not the list). Intended for queues up to ~10^5 pending items
   * per key (lease/retry work queues, the reference's use case); beyond
   * that, shard the queue key (the reference does exactly this with
   * per-swamp queues, e.g. `queue/shard-N`) so each state entry stays
   * bounded. Within-batch cost is verified by the StreamingSpec envelope
   * test.
   */
  final case class QueueState(items: List[Item], lastSeq: Long)
  implicit private val stateEnc: Encoder[QueueState] = Encoders.product[QueueState]
  implicit private val claimedEnc: Encoder[Claimed] = Encoders.product[Claimed]
  implicit private val strEnc: Encoder[String] = Encoders.STRING

  /**
   * PRODUCER CONTRACT (load-bearing, not advisory): commands for one queue
   * must reach the stream in non-decreasing `seq` order ACROSS micro-batches
   * — i.e. the source must be partitioned/keyed by queue (exactly how the
   * reference shards per-swamp queues). Within one batch any arrival order
   * is fine (commands replay sorted), but a FRESH command that arrives in a
   * LATER batch with a seq below the applied high-water mark is
   * indistinguishable from an at-least-once redelivery and is dropped —
   * distinguishing them would require remembering every applied seq, which
   * is unbounded. `idleTtl` (opt-in) retires a DRAINED queue's state entry
   * after that much processing-time idleness, bounding state for workloads
   * with ephemeral queue keys; the tradeoff is the [[StatefulFeed]]
   * tombstone one — a command redelivered later than the TTL replays as
   * new. A queue with pending items never retires.
   */
  def run(commands: Dataset[Cmd],
          idleTtl: Option[String] = None): Dataset[Claimed] =
    commands
      .groupByKey(_.queue)
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (queue: String, cmds: Iterator[Cmd], state: GroupState[QueueState]) =>
          if (state.hasTimedOut) {
            // armed only when the queue drained; items cannot be lost here
            state.remove()
            Iterator.empty
          } else {
          val st = state.getOption.getOrElse(QueueState(Nil, Long.MinValue))
          var items = st.items
          var lastSeq = st.lastSeq
          // the sentinel lastSeq == Long.MinValue is only a guard once a
          // command HAS applied: a fresh queue's first command may itself
          // carry seq = Long.MinValue and must not be swallowed by the
          // sentinel comparing equal to it
          var hasSeq = state.getOption.isDefined
          // pending-id membership as a Set maintained alongside the list:
          // per-enqueue List.exists would make an enqueue-heavy batch
          // O(enqueues x pending), breaking the documented envelope
          var ids = items.iterator.map(_.id).toSet
          val out = scala.collection.mutable.ArrayBuffer.empty[Claimed]
          // commands replay in seq order: enqueue/claim interleavings are
          // deterministic however the micro-batch was partitioned; commands
          // at-or-below the applied high-water seq are redeliveries (see
          // QueueState doc) and must not re-execute. The guard is the FIRST
          // case, re-read per command — a strict pre-filter would compare
          // every command against the batch-INITIAL high-water seq, letting
          // two copies of one command inside a single micro-batch both
          // execute (the second would re-claim under a stale claimId)
          cmds.toSeq.sortBy(_.seq).foreach {
            case c if hasSeq && c.seq <= lastSeq => () // redelivery, incl. in-batch dup
            // a null-id enqueue is unaddressable (the batch Shift null-key
            // rule) — and worse, a CHECKPOINTED poison pill: the claim
            // path's (expireAtMs, id) sort NPEs on the null id whenever
            // two expired items tie on expiry, and the crash replays on
            // every restart because the item persists in state. Consume
            // the seq, skip the item.
            case c if c.op == "E" && c.id == null =>
              lastSeq = c.seq; hasSeq = true
            case c if c.op == "E" =>
              lastSeq = c.seq; hasSeq = true
              if (!ids(c.id)) {
                items = Item(c.id, c.expireAtMs, c.value) :: items
                ids += c.id
              }
            case c if c.op == "C" =>
              lastSeq = c.seq; hasSeq = true
              val (expired, live) = items.partition(_.expireAtMs < c.nowMs)
              val take = expired.sortBy(i => (i.expireAtMs, i.id)).take(c.n)
              val takenIds = take.map(_.id).toSet
              items = live ++ expired.filterNot(i => takenIds(i.id))
              ids --= takenIds
              out ++= take.map(i => Claimed(queue, c.claimId, i.id, i.expireAtMs, i.value))
            case c => lastSeq = c.seq; hasSeq = true // unknown op: consumed, not re-runnable
          }
          // the state entry persists even with an empty pending list: it
          // carries the high-water seq (dropping it would re-open the
          // redelivery window the moment a queue drains). With idleTtl a
          // DRAINED queue arms a retirement timer instead of living forever;
          // a non-empty queue never arms one (its items must survive).
          state.update(QueueState(items, lastSeq))
          if (items.isEmpty) idleTtl.foreach(state.setTimeoutDuration)
          out.iterator
          }
      }
}
