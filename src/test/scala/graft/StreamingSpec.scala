package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/**
 * Structured Streaming behavior: the Subscribe event algebra over a live
 * command stream (NEW/MODIFIED/DELETED with old values, per micro-batch)
 * and watermarked windowed aggregation — the reference's reactive layer
 * (proto:363-395,755-801) on Spark's micro-batch model.
 */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  case class Cmd(op: String, seq: Long, key: String, v: Int)
  case class ImpEv(ad: String, its: java.sql.Timestamp)
  case class ClkEv(ad: String, cts: java.sql.Timestamp)

  test("subscribeToEvents emits NEW / MODIFIED / DELETED across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Cmd]
    val seen = scala.collection.mutable.ArrayBuffer[(String, String, Option[Int], Option[Int])]()

    val q = Streams.subscribeToEvents(input.toDF(), "key", "seq", events =>
      seen ++= events.collect().map(r => (
        r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.get(3)).map(_.asInstanceOf[Int])))
    ).start()

    input.addData(Cmd("U", 1, "k1", 1), Cmd("U", 2, "k2", 2))
    q.processAllAvailable()
    input.addData(Cmd("U", 3, "k1", 10), Cmd("D", 4, "k2", 0), Cmd("U", 5, "k3", 3))
    q.processAllAvailable()
    q.stop()

    val byBatch = seen.toSeq
    assert(byBatch.take(2).map(e => (e._1, e._2)).toSet == Set("k1" -> "NEW", "k2" -> "NEW"))
    val second = byBatch.drop(2).map(e => e._1 -> e).toMap
    assert(second("k1")._2 == "MODIFIED" && second("k1")._3 == Some(10) && second("k1")._4 == Some(1))
    assert(second("k2")._2 == "DELETED" && second("k2")._3 == None && second("k2")._4 == Some(2))
    assert(second("k3")._2 == "NEW" && second("k3")._3 == Some(3))
  }

  test("per-key last-write-wins follows the explicit seq, not partition order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Cmd]
    val seen = scala.collection.mutable.ArrayBuffer[(String, String, Option[Int])]()

    // repartition(8): position-derived ordering (the round-1 bug) would pick
    // an arbitrary survivor; the explicit seq must make it deterministic
    val q = Streams.subscribeToEvents(input.toDF().repartition(8), "key", "seq", events =>
      seen ++= events.collect().map(r => (
        r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Int])))
    ).start()

    input.addData((1 to 20).map(i => Cmd("U", i.toLong, "k", i)): _*)
    q.processAllAvailable()
    q.stop()

    assert(seen.toSeq == Seq(("k", "NEW", Some(20))))
  }

  test("stateful change feed: per-write events in seq order, bounded state") {
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.Command
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Command]
    val feed = StatefulFeed.changeFeed(input.toDS().repartition(8))
    val q = feed.writeStream.outputMode("append").format("memory")
      .queryName("sf_out").start()

    input.addData(Command("a", 1, "U", "v1"), Command("a", 2, "U", "v2"),
      Command("b", 1, "U", "w1"))
    q.processAllAvailable()
    input.addData(Command("a", 3, "D", ""), Command("b", 2, "U", "w1"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sf_out")
      .select("key", "seq", "_status", "value", "old_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet
    assert(rows == Set(
      ("a", 1L, "NEW", Some("v1"), None),
      ("a", 2L, "MODIFIED", Some("v2"), Some("v1")),
      ("b", 1L, "NEW", Some("w1"), None),
      ("a", 3L, "DELETED", None, Some("v2"))))
    // b's second write carried the same value => no event (reference only
    // notifies on actual content change)
  }

  test("stateful change feed: a null-valued upsert cannot forge a tombstone") {
    // null is the tombstone SENTINEL — storing it as a value would make
    // the next upsert read as NEW (not MODIFIED) and a following delete
    // emit nothing; the feed must drop null-valued upserts instead
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.Command
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Command]
    val q = StatefulFeed.changeFeed(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("sf_null_out").start()

    input.addData(Command("k", 1, "U", "a"), Command("k", 2, "U", null),
      Command("k", 3, "U", "b"), Command("k", 4, "D", ""))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sf_null_out")
      .select("seq", "_status", "value", "old_value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(rows == Set(
      (1L, "NEW", Some("a"), None),
      (3L, "MODIFIED", Some("b"), Some("a")), // NOT "NEW past tombstone"
      (4L, "DELETED", None, Some("b"))),      // delete still observable
      s"null upsert leaked into state: $rows")
  }

  test("low-latency mode: Trigger.ProcessingTime(0) keeps per-key FIFO across micro-batches") {
    // The reference pushes ONE event per write over its gRPC stream
    // (proto/hydraide.proto:755-801) — per-write latency is µs. Spark's
    // floor is a micro-batch: Trigger.ProcessingTime(0) re-plans as soon as
    // the previous batch commits, so delivery latency is one batch cycle
    // (measured here: tens of ms on local[32], vs µs for the reference —
    // that delta is the documented engine tradeoff; the ORDER guarantee
    // below is what carries over exactly). Per-key FIFO must hold even when
    // a key's writes are split across many micro-batches.
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.{Change, Command}
    import org.apache.spark.sql.Dataset
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Command]
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Change])]
    val q = StatefulFeed.changeFeed(input.toDS().repartition(4))
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (b: Dataset[Change], id: Long) =>
        val rows = b.collect().toSeq
        if (rows.nonEmpty) batches.synchronized { batches += id -> rows; () }
      }
      .start()

    // 3 keys x 8 chunks of interleaved writes; the barrier between chunks
    // forces real micro-batch boundaries inside each key's history
    val keys = Seq("a", "b", "c")
    var seq = 0L
    for (_ <- 1 to 8) {
      input.addData(keys.map { k => seq += 1; Command(k, seq, "U", s"$k$seq") })
      q.processAllAvailable()
    }
    // latency probe: one more write, time until its event surfaces
    val t0 = System.nanoTime()
    input.addData(Command("a", seq + 1, "U", "last"))
    q.processAllAvailable()
    val latencyMs = (System.nanoTime() - t0) / 1e6
    q.stop()

    val ordered = batches.synchronized { batches.sortBy(_._1).toSeq }
    assert(ordered.size >= 8, s"writes were not spread over micro-batches: ${ordered.size}")
    for (k <- keys) {
      // flatten in (batch commit, within-batch emit) order — the order a
      // subscriber observes; seq must be strictly increasing and old_value
      // must chain to the previous value with no gaps
      val evs = ordered.flatMap(_._2).filter(_.key == k)
      assert(evs.map(_.seq) == evs.map(_.seq).sorted &&
        evs.map(_.seq).distinct == evs.map(_.seq),
        s"key $k events out of FIFO order: ${evs.map(_.seq)}")
      evs.sliding(2).foreach {
        case Seq(p, c) => assert(c.old_value == p.value,
          s"key $k chain break at seq ${c.seq}: old=${c.old_value} prev=${p.value}")
        case _ => ()
      }
    }
    // not a perf assert (CI noise) — just a sanity ceiling proving delivery
    // is batch-cycle, not minutes; the real number lands in the test log
    info(f"subscribe delivery latency (one write, ProcessingTime(0)): $latencyMs%.0f ms")
    assert(latencyMs < 30000)
  }

  test("changeFeedTws (transformWithState) == changeFeed event-for-event, " +
       "including tombstone semantics, on the RocksDB store") {
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.Command
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(form: String): Set[(String, Long, String, Option[String], Option[String])] = {
        val input = MemoryStream[Command]
        val ds = input.toDS().repartition(4)
        val feed = if (form == "tws") StatefulFeed.changeFeedTws(ds)
                   else StatefulFeed.changeFeed(ds)
        val q = feed.writeStream.outputMode("append").format("memory")
          .queryName(s"tws_eq_$form").start()
        input.addData(Command("a", 1, "U", "v1"), Command("b", 1, "U", "w1"),
          Command("a", 2, "U", "v2"))
        q.processAllAvailable()
        input.addData(Command("a", 3, "D", ""), Command("b", 2, "U", "w1"),
          Command("c", 5, "D", ""), Command("a", 4, "U", "v4"))
        q.processAllAvailable()
        // stale replay + resurrection guard: must be a no-op in both forms
        input.addData(Command("a", 2, "U", "v2"), Command("c", 3, "U", "ghost"))
        q.processAllAvailable()
        q.stop()
        spark.table(s"tws_eq_$form")
          .select("key", "seq", "_status", "value", "old_value")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
            Option(r.getString(3)), Option(r.getString(4)))).toSet
      }
      val v1 = run("v1")
      val v2 = run("tws")
      assert(v2 == v1, s"transformWithState feed drifted from v1:\n$v2\n$v1")
      assert(v1.contains(("a", 4L, "NEW", Some("v4"), None)),
        "post-tombstone upsert must emit NEW in both forms")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("subscribe: per-EVENT delivery; per-key order equals write order " +
       "across micro-batches (the queue-consumer contract)") {
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.Command
    implicit val sqlCtx = spark.sqlContext
    StreamingSpecSink.q.clear()
    val input = MemoryStream[Command]
    val q = StatefulFeed.subscribe(
      StatefulFeed.changeFeed(input.toDS().repartition(4)),
      StreamingSpecSink.deliver).start()
    val keys = Seq("a", "b", "c")
    var seq = 0L
    for (_ <- 1 to 5) { // 5 real micro-batch boundaries inside each history
      input.addData(keys.flatMap { k =>
        Seq({ seq += 1; Command(k, seq, "U", s"$k$seq") },
            { seq += 1; Command(k, seq, "U", s"$k$seq") })
      })
      q.processAllAvailable()
    }
    q.stop()
    val delivered = StreamingSpecSink.q.toArray(Array.empty[StatefulFeed.Change]).toSeq
    assert(delivered.size == keys.size * 10,
      s"expected one delivery per write: ${delivered.size}")
    for (k <- keys) {
      val evs = delivered.filter(_.key == k)
      assert(evs.map(_.seq) == evs.map(_.seq).sorted,
        s"key $k delivered out of write order: ${evs.map(_.seq)}")
      evs.sliding(2).foreach {
        case Seq(p, c) => assert(c.old_value == p.value,
          s"key $k value chain broke at seq ${c.seq}")
        case _ => ()
      }
    }
  }

  test("dedupStream: first arrival wins across micro-batches; state evicts past watermark") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[(String, Timestamp, String)]
    val stream = input.toDF().toDF("digest", "ts", "text")
    val q = graft.streaming.Streams.dedupStream(stream, "digest", "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_evict_out")
      .start()

    input.addData(("d1", ts(0), "a"), ("d2", ts(1), "b"))
    q.processAllAvailable()
    // same digest in a later micro-batch, inside the watermark delay: dropped
    input.addData(("d1", ts(2), "a-dup"), ("d3", ts(3), "c"))
    q.processAllAvailable()
    // advance event time far past d1's eviction horizon, then re-send d1:
    // its dedup state is gone, so the late copy is treated as NEW (the
    // documented tradeoff — the batch dedup sweeps the long tail)
    input.addData(("adv", ts(60), "advance"))
    q.processAllAvailable()
    input.addData(("d1", ts(61), "a-late"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_evict_out").select("digest", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("d1", "a"), ("d2", "b"), ("d3", "c"),
      ("adv", "advance"), ("d1", "a-late")))
  }

  test("tombstone: replayed stale upsert cannot resurrect a deleted key") {
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.Command
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Command]
    val q = StatefulFeed.changeFeed(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("tomb_out").start()

    input.addData(Command("a", 1, "U", "v1"), Command("a", 2, "U", "v2"))
    q.processAllAvailable()
    input.addData(Command("a", 3, "D", ""))
    q.processAllAvailable()
    // at-least-once redelivery of the OLD upsert after the delete: without a
    // tombstone this re-emitted NEW(v2)
    input.addData(Command("a", 2, "U", "v2"))
    q.processAllAvailable()
    // a genuinely newer write after the delete IS a NEW
    input.addData(Command("a", 4, "U", "v4"))
    q.processAllAvailable()
    q.stop()

    val events = spark.table("tomb_out").select("seq", "_status", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(events == Set(
      (1L, "NEW", Some("v1")),
      (2L, "MODIFIED", Some("v2")),
      (3L, "DELETED", None),
      (4L, "NEW", Some("v4"))))
  }

  /** Shared parquet command-source scaffolding for the file-backed
    * change-feed tests: one writer and one readStream construction, so a
    * schema or source-option change hits every test at once. */
  private def commandSource(prefix: String) = {
    import graft.streaming.StatefulFeed.Command
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    val srcDir = s"$tmp/commands"
    val write = (cmds: Seq[Command]) =>
      cmds.toDS().coalesce(1).write.mode("append").parquet(srcDir)
    val read = () => spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Command]].schema)
      .parquet(srcDir).as[Command]
    (tmp, write, read)
  }

  test("file-source E2E: parquet command increments -> changeFeed -> events") {
    // closes the MemoryStream-only gap: a real file source with schema,
    // discovery of files written after the query starts, and checkpointed
    // state across micro-batches
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.Command
    val (tmp, write, read) = commandSource("graft_e2e")
    def writeBatch(cmds: Command*): Unit = write(cmds.toSeq)

    writeBatch(Command("a", 1, "U", "v1"), Command("b", 1, "U", "w1"))
    val src = read()
    val q = StatefulFeed.changeFeed(src).writeStream
      .outputMode("append").format("memory").queryName("e2e_out")
      .option("checkpointLocation", s"$tmp/chk").start()
    q.processAllAvailable()
    writeBatch(Command("a", 2, "U", "v2"), Command("b", 2, "D", ""))
    q.processAllAvailable()
    q.stop()

    val events = spark.table("e2e_out")
      .select("key", "seq", "_status", "value", "old_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet
    assert(events == Set(
      ("a", 1L, "NEW", Some("v1"), None),
      ("b", 1L, "NEW", Some("w1"), None),
      ("a", 2L, "MODIFIED", Some("v2"), Some("v1")),
      ("b", 2L, "DELETED", None, Some("w1"))))
  }

  test("AvailableNow catch-up: drain the backlog, terminate, resume from checkpoint") {
    // the periodic-batch operating mode of a subscribe feed: each scheduled
    // run drains everything available, emits the delta events, and EXITS —
    // state survives in the checkpoint so the next run continues exactly
    // where the last one stopped (no re-emitted NEW for old keys)
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.Command
    import org.apache.spark.sql.streaming.Trigger
    val (tmp, write, read) = commandSource("graft_avnow")
    def writeBatch(cmds: Command*): Unit = write(cmds.toSeq)
    // memory sink can't recover from a checkpoint — collect each run's
    // delta through foreachBatch instead (which can)
    def runOnce(): Set[(String, Long, String, Option[String], Option[String])] = {
      val got = scala.collection.mutable.Set
        .empty[(String, Long, String, Option[String], Option[String])]
      val src = read()
      val q = StatefulFeed.changeFeed(src).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StatefulFeed.Change], _: Long) =>
            val rows = b.collect()
            got.synchronized {
              rows.foreach(c => got += ((c.key, c.seq, c._status,
                Option(c.value), Option(c.old_value))))
              ()
            }
        }
        .start()
      assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
      got.synchronized(got.toSet)
    }

    writeBatch(Command("a", 1, "U", "v1"), Command("b", 1, "U", "w1"))
    val first = runOnce()
    assert(first == Set(
      ("a", 1L, "NEW", Some("v1"), None),
      ("b", 1L, "NEW", Some("w1"), None)))

    writeBatch(Command("a", 2, "U", "v2"))
    // second scheduled run: exactly the delta, chaining off the
    // checkpointed state — and crucially no replayed NEWs for old keys
    val second = runOnce()
    assert(second == Set(("a", 2L, "MODIFIED", Some("v2"), Some("v1"))))
  }

  test("stream-static enrichment joins a broadcast dimension per event") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Cmd]
    val dim = Seq(("k1", "gold"), ("k2", "silver")).toDF("key", "tier")
    val q = Streams.enrich(input.toDF(), dim, Seq("key"))
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    input.addData(Cmd("U", 1, "k1", 10), Cmd("U", 2, "k3", 30))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enrich_out").select("key", "tier")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows == Map("k1" -> Some("gold"), "k3" -> None))
  }

  test("stream-stream interval join: in-window right events join, late/unmatched don't") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[ImpEv]
    val clks = MemoryStream[ClkEv]
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime + min * 60000L)
    val q = Streams.intervalJoin(imps.toDF(), clks.toDF(), "ad",
        "its", "cts", within = "10 minutes", watermarkDelay = "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()
    imps.addData(ImpEv("a1", ts(0)), ImpEv("a2", ts(0)))
    clks.addData(ClkEv("a1", ts(5)))  // within the 10-minute window
    q.processAllAvailable()
    clks.addData(ClkEv("a2", ts(20))) // past the window for a2's impression
    clks.addData(ClkEv("a3", ts(5)))  // no impression at all
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_out").select("ad", "its", "cts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSeq
    assert(rows == Seq(("a1", ts(0), ts(5))),
      s"expected exactly the in-window pair, got ${rows.mkString(", ")}")
  }

  test("streaming shift queue: claims are oldest-first, bounded, and disjoint") {
    import graft.streaming.ShiftQueue
    import graft.streaming.ShiftQueue.{Cmd => QCmd}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QCmd]
    val q = ShiftQueue.run(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("queue_out").start()

    input.addData(
      QCmd.enqueue("q1", 1, "a", expireAtMs = 100, "va"),
      QCmd.enqueue("q1", 2, "b", expireAtMs = 50, "vb"),
      QCmd.enqueue("q1", 3, "c", expireAtMs = 900, "vc"))
    q.processAllAvailable()
    // first claim at now=500: a and b expired; n=1 takes the OLDEST (b)
    input.addData(QCmd.claim("q1", 4, "claim1", n = 1, nowMs = 500))
    q.processAllAvailable()
    // second claim: b is gone (disjointness); only a remains expired
    input.addData(QCmd.claim("q1", 5, "claim2", n = 5, nowMs = 500))
    q.processAllAvailable()
    q.stop()

    val claimed = spark.table("queue_out")
      .select("claimId", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(claimed == Set(("claim1", "b"), ("claim2", "a"))) // c unexpired, kept
  }

  test("streaming shift queue: stays correct and prompt at the documented size envelope") {
    // QueueState's per-batch cost is O(pending), so a queue holding
    // thousands of items must still claim correctly in ordinary batch time
    // (the documented envelope is ~1e5; 5k keeps the test fast)
    import graft.streaming.ShiftQueue
    import graft.streaming.ShiftQueue.{Cmd => QCmd}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QCmd]
    val q = ShiftQueue.run(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("queue_env_out").start()

    val n = 5000
    input.addData((1 to n).map(i =>
      QCmd.enqueue("big", i.toLong, s"item$i", expireAtMs = i.toLong, s"v$i")): _*)
    q.processAllAvailable()
    // claim 100: the 100 oldest-expiring of the 4999 expired (now=5000)
    input.addData(QCmd.claim("big", n + 1L, "c1", n = 100, nowMs = 5000))
    q.processAllAvailable()
    // a second claim gets the NEXT 100 — disjoint even at volume
    input.addData(QCmd.claim("big", n + 2L, "c2", n = 100, nowMs = 5000))
    q.processAllAvailable()
    q.stop()

    val byClaim = spark.table("queue_env_out").collect()
      .groupBy(_.getString(1)).map { case (c, rows) =>
        c -> rows.map(_.getLong(3)).sorted.toSeq }
    assert(byClaim("c1") == (1L to 100L))
    assert(byClaim("c2") == (101L to 200L))
  }

  test("streaming shift queue: redelivered commands are no-ops, even after drain") {
    // at-least-once source replay: a claim must not drain the NEXT items
    // under its stale claimId, and an enqueue replayed after its item was
    // claimed must not resurrect it. Both guards live in the state's
    // high-water seq — which must SURVIVE the queue draining empty (the
    // state entry persists; dropping it would re-open the window).
    import graft.streaming.ShiftQueue
    import graft.streaming.ShiftQueue.{Cmd => QCmd}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QCmd]
    val q = ShiftQueue.run(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("queue_redeliver_out").start()

    input.addData(
      QCmd.enqueue("q1", 1, "a", expireAtMs = 100, "va"),
      QCmd.enqueue("q1", 2, "b", expireAtMs = 50, "vb"))
    q.processAllAvailable()
    // claim both -> queue is now EMPTY (the hard case: empty state must
    // still remember seq 3)
    input.addData(QCmd.claim("q1", 3, "c1", n = 5, nowMs = 500))
    q.processAllAvailable()
    // redeliver the claim AND one of the consumed enqueues
    input.addData(
      QCmd.claim("q1", 3, "c1", n = 5, nowMs = 500),
      QCmd.enqueue("q1", 1, "a", expireAtMs = 100, "va"))
    q.processAllAvailable()
    // a fresh claim sees nothing: "a" was not resurrected
    input.addData(QCmd.claim("q1", 4, "c2", n = 5, nowMs = 500))
    q.processAllAvailable()
    q.stop()

    val claimed = spark.table("queue_redeliver_out")
      .select("claimId", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(claimed == Set(("c1", "b"), ("c1", "a"))) // exactly once, oldest first
  }

  test("streaming shift queue: duplicate command INSIDE one micro-batch executes once") {
    // a producer-retry duplicate can land both copies in the SAME batch; a
    // strict pre-filter against the batch-initial high-water seq passes
    // both, and the second claim would drain the NEXT pending item under
    // the stale claimId — the guard must re-read the live seq per command
    import graft.streaming.ShiftQueue
    import graft.streaming.ShiftQueue.{Cmd => QCmd}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QCmd]
    val q = ShiftQueue.run(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("queue_dup_out").start()

    input.addData(
      QCmd.enqueue("q1", 1, "a", expireAtMs = 100, "va"),
      QCmd.enqueue("q1", 2, "b", expireAtMs = 50, "vb"),
      QCmd.claim("q1", 3, "c1", n = 1, nowMs = 500),
      QCmd.claim("q1", 3, "c1", n = 1, nowMs = 500), // same command twice
      QCmd.enqueue("q1", 1, "a2", expireAtMs = 100, "xx")) // dup enqueue seq
    q.processAllAvailable()
    // "a" must still be claimable: the duplicate claim was a no-op, and
    // the duplicate enqueue neither re-ran nor added a second item
    input.addData(QCmd.claim("q1", 4, "c2", n = 5, nowMs = 500))
    q.processAllAvailable()
    q.stop()

    val claimed = spark.table("queue_dup_out")
      .select("claimId", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(claimed == Set(("c1", "b"), ("c2", "a")),
      s"duplicate in-batch claim must not double-drain: $claimed")
  }

  case class Ev(ts: java.sql.Timestamp, event_type: String, value: Double)

  test("windowed counts with watermark produce per-window aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = Streams.windowedCounts(input.toDF(), "ts", "event_type",
      windowLen = "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()

    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    input.addData(Ev(ts(1), "click", 1.0), Ev(ts(2), "click", 2.0), Ev(ts(12), "click", 4.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_out")
      .select(col("window_start").cast("string"), col("n"), col("val"))
      .as[(String, Long, Double)].collect().map { case (k, v, w) => (k, (v, w)) }.toMap
    assert(rows("2024-01-01 10:00:00") == (2L, 3.0))
    assert(rows("2024-01-01 10:10:00") == (1L, 4.0))
  }

  test("streaming anomaly: z-scored against PRIOR state, baseline still updates") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Anomaly
    import graft.streaming.Anomaly.Obs
    val input = MemoryStream[Obs]
    val q = Anomaly.detect(input.toDS(), minSamples = 5, zThreshold = 3.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("anom_out").start()

    // batch 1: a stable baseline around 10 (no flags — below minSamples,
    // then in-band)
    input.addData((1 to 8).map(i => Obs("k", i.toLong, 10.0 + (i % 2) * 0.2)): _*)
    q.processAllAvailable()
    // batch 2: a level spike must flag ON ARRIVAL (state is prior-only),
    // and the next normal value must NOT flag (baseline absorbed the
    // spike but the band is now wider, not recentered to the spike)
    input.addData(Obs("k", 9L, 50.0), Obs("k", 10L, 10.1), Obs("other", 1L, 99.0))
    q.processAllAvailable()
    q.stop()

    val flags = spark.table("anom_out").as[Anomaly.Flag].collect()
    assert(flags.map(f => (f.key, f.seq)).toSet == Set(("k", 9L)),
      s"got ${flags.toSeq}") // spike flagged; 'other' has no history => silent
    assert(flags.head.z > 3.0)
  }

  test("streaming anomaly: redelivered and non-finite observations never touch the baseline") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Anomaly
    import graft.streaming.Anomaly.Obs
    val input = MemoryStream[Obs]
    val q = Anomaly.detect(input.toDS(), minSamples = 5, zThreshold = 3.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("anom_guard_out").start()

    // stable baseline around 10, absorbed high-water seq = 8
    input.addData((1 to 8).map(i => Obs("k", i.toLong, 10.0 + (i % 2) * 0.2)): _*)
    q.processAllAvailable()
    // batch 2, all hostile except the last:
    //  - seq 3 @ 1000.0 is a REDELIVERY (seq <= high water): if absorbed it
    //    would both flag itself and widen the band so much that 50.0 below
    //    could never flag
    //  - NaN / +Inf at seqs 9-10: one NaN absorbed poisons mean and m2
    //    forever (z-scores go NaN, which compares false against the
    //    threshold -> no flag ever again)
    //  - seq 11 @ 50.0 is the probe: it must flag, with a finite z, against
    //    the UNPOISONED baseline
    input.addData(
      Obs("k", 3L, 1000.0),
      Obs("k", 9L, Double.NaN),
      Obs("k", 10L, Double.PositiveInfinity),
      Obs("k", 11L, 50.0))
    q.processAllAvailable()
    q.stop()

    val flags = spark.table("anom_guard_out").as[Anomaly.Flag].collect()
    assert(flags.map(f => (f.key, f.seq)).toSet == Set(("k", 11L)), s"got ${flags.toSeq}")
    assert(java.lang.Double.isFinite(flags.head.z) && flags.head.z > 3.0)
  }

  test("streaming anomaly: duplicated observation INSIDE one micro-batch absorbs once") {
    // both copies of a source-side duplicate can arrive in the same batch;
    // absorbing the value twice double-weights it in the Welford moments.
    // Two identical baselines, one fed the duplicate — their next z-scores
    // must agree exactly (moments unaffected by the extra copy).
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Anomaly
    import graft.streaming.Anomaly.Obs
    val input = MemoryStream[Obs]
    val q = Anomaly.detect(input.toDS(), minSamples = 5, zThreshold = 3.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("anom_dup_out").start()

    val base = (1 to 7).map(i => Obs("dup", i.toLong, 10.0 + (i % 2) * 0.2)) ++
      Seq(Obs("dup", 8L, 12.0), Obs("dup", 8L, 12.0)) // same obs twice, one batch
    val clean = (1 to 7).map(i => Obs("ref", i.toLong, 10.0 + (i % 2) * 0.2)) ++
      Seq(Obs("ref", 8L, 12.0))
    input.addData(base ++ clean: _*)
    q.processAllAvailable()
    input.addData(Obs("dup", 9L, 50.0), Obs("ref", 9L, 50.0))
    q.processAllAvailable()
    q.stop()

    val z = spark.table("anom_dup_out").as[Anomaly.Flag].collect()
      .map(f => f.key -> f.z).toMap
    assert(z.keySet == Set("dup", "ref"), s"both probes must flag: $z")
    assert(z("dup") == z("ref"),
      s"duplicate absorbed into moments: z diverged ${z("dup")} vs ${z("ref")}")
  }

  test("streaming incremental rollup: foreachBatch maintenance equals recompute") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IncrementalAgg
    val input = MemoryStream[(String, Double, String)] // (group, value, I|D)
    // the maintained view lives across micro-batches; each batch advances
    // it by its own inserts/removes only — the base is never re-read
    var view = IncrementalAgg.rollup(
      Seq.empty[(String, Double)].toDF("g", "v"), "g", "v")
      .collect().toSeq
    def viewDf = view.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
      .toDF("g", "cnt", "sum_v", "cnt_v")
    val q = input.toDF().toDF("g", "v", "op").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        view = IncrementalAgg.applyChanges(viewDf,
          batch.filter(col("op") === "I").select("g", "v"),
          batch.filter(col("op") === "D").select("g", "v"),
          "g", "v").collect().toSeq
        ()
      }.start()

    input.addData(("a", 1.0, "I"), ("a", 2.0, "I"), ("b", 5.0, "I"))
    q.processAllAvailable()
    input.addData(("a", 1.0, "D"), ("c", 7.0, "I"), ("b", 5.0, "D"))
    q.processAllAvailable()
    q.stop()

    val got = view.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // recompute over the net surviving rows: a={2.0}, c={7.0}, b gone
    assert(got == Map("a" -> (1L, 2.0), "c" -> (1L, 7.0)))
  }

  test("streaming sessionization: sessions close at the gap and emit once, final") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = graft.streaming.Streams.sessionCounts(input.toDF(), "ts",
      "event_type", gap = "5 minutes", watermark = "0 seconds")
    // append mode: a session row emits only once its window CLOSES (the
    // watermark passed end + gap) — the bounded-state contract under test
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()

    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // one 3-event session (1,3,6 — gaps < 5 min), then silence past the gap
    input.addData(Ev(ts(1), "click", 1.0), Ev(ts(3), "click", 1.0), Ev(ts(6), "click", 1.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").isEmpty,
      "open session must not emit before the gap passes")
    // an event 20 min later: advances the watermark past 10:11 => session 1
    // closes and emits; the new event opens session 2 (still open => absent)
    input.addData(Ev(ts(26), "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_out")
      .select(col("session_start").cast("string"),
        col("session_end").cast("string"), col("n"))
      .as[(String, String, Long)].collect()
    assert(rows.toSeq == Seq(("2024-01-01 10:01:00", "2024-01-01 10:11:00", 3L)))
  }

  test("streaming exact dedup: duplicate keys within the watermark emit once") {
    // the streaming face of Dedup.exact: dropDuplicatesWithinWatermark
    // keys state only until the watermark passes — bounded state, unlike
    // plain dropDuplicates whose key set grows forever
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val deduped = graft.streaming.Streams.dedupStream(
      input.toDF(), "event_type", "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    input.addData(Ev(ts(1), "click", 1.0), Ev(ts(2), "click", 2.0), Ev(ts(3), "view", 3.0))
    q.processAllAvailable()
    input.addData(Ev(ts(4), "click", 4.0)) // still within watermark: dropped
    q.processAllAvailable()
    q.stop()
    val vals = spark.table("dedup_out").select("event_type", "value")
      .as[(String, Double)].collect().toMap
    assert(vals == Map("click" -> 1.0, "view" -> 3.0)) // first occurrence wins
  }

  test("snapshot sink: micro-batches merge exactly-once; replayed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Snapshots
    import graft.streaming.SnapshotSink
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    val input = MemoryStream[KV2]
    val q = input.toDF().writeStream
      .foreachBatch(SnapshotSink.mergeBatch(dir, "key", runId = "run1") _)
      .start()
    input.addData(KV2("a", 1.0), KV2("b", 2.0))
    q.processAllAvailable()
    input.addData(KV2("b", 9.0), KV2("c", 3.0)) // upsert + insert
    q.processAllAvailable()
    q.stop()
    val state = Snapshots.read(spark, dir).as[KV2].collect()
      .map(kv => kv.key -> kv.v).toMap
    assert(state == Map("a" -> 1.0, "b" -> 9.0, "c" -> 3.0))
    val v = Snapshots.currentVersion(spark, dir)
    assert(SnapshotSink.lastCommitted(spark, dir).exists(_._1 == "run1"))
    // at-least-once replay WITHIN the run: re-running an old batch = no-op
    SnapshotSink.mergeBatch(dir, "key", runId = "run1")(
      Seq(KV2("b", 2.0)).toDF("key", "v"), batchId = 0L)
    assert(Snapshots.currentVersion(spark, dir) == v)
    assert(Snapshots.read(spark, dir).as[KV2].collect()
      .map(kv => kv.key -> kv.v).toMap == state)
    // an interleaved maintenance commit without sink metadata must not
    // erase replay protection (high-water mark walks back through versions)
    Snapshots.commit(Snapshots.read(spark, dir), dir)
    SnapshotSink.mergeBatch(dir, "key", runId = "run1")(
      Seq(KV2("b", 2.0)).toDF("key", "v"), batchId = 1L)
    assert(Snapshots.read(spark, dir).as[KV2].collect()
      .map(kv => kv.key -> kv.v).toMap == state) // still the replayed no-op
    // a REDEPLOYED query (fresh checkpoint => batchIds restart at 0) is a
    // new run: batch 0 must apply, not be mistaken for replay
    SnapshotSink.mergeBatch(dir, "key", runId = "run2")(
      Seq(KV2("d", 4.0)).toDF("key", "v"), batchId = 0L)
    assert(Snapshots.read(spark, dir).as[KV2].collect()
      .map(kv => kv.key -> kv.v).toMap == state + ("d" -> 4.0))
  }

  test("TTL column marks expiry horizon in event time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val ttld = Streams.withTtl(input.toDF(), "ts", "30 minutes")
    val q = ttld.writeStream.outputMode("append").format("memory")
      .queryName("ttl_out").start()
    input.addData(Ev(java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "x", 1.0))
    q.processAllAvailable()
    q.stop()
    val exp = spark.table("ttl_out").select(col("_expires_at").cast("string")).as[String].head()
    assert(exp == "2024-01-01 10:30:00")
  }

  test("streaming crawl dedup against the prebuilt corpus signature table") {
    // the cross-crawl artifact in its streaming seat: buildSignatures once
    // (the batch corpus job), then every crawl micro-batch near-dup-filters
    // against it inside foreachBatch — the corpus is never re-signed
    import graft.operators.Dedup
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "an entirely different reference document about spark engines"))
      .toDF("doc_id", "text")
    val sigPath = java.nio.file.Files
      .createTempDirectory("graft-stream-sig").toString + "/sigs"
    Dedup.buildSignatures(corpus, "text", "doc_id", sigPath)

    val input = MemoryStream[(Long, String)]
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val kept = Dedup.dedupAgainstCorpusPrebuilt(spark, sigPath, b.toDF(),
            "text", "doc_id", threshold = 0.5)
          .select("doc_id").collect().map(_.getLong(0))
        survivors.synchronized { survivors ++= kept; () }
      }
      .start()

    // batch 1: one near-copy of corpus doc 100, one fresh doc
    input.addData((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely novel content that matches nothing in the corpus"))
    q.processAllAvailable()
    // batch 2: another near-copy (of 101) and another fresh doc
    input.addData((3L, "an entirely different reference document about spark engines"),
      (4L, "more novel text unlike anything the corpus has seen before"))
    q.processAllAvailable()
    q.stop()

    assert(survivors.synchronized(survivors.sorted.toSeq) == Seq(2L, 4L),
      s"near-dups of the corpus must drop per micro-batch: $survivors")
  }

  test("streaming crawl dedup grows the artifact: later batches dedup against earlier survivors") {
    // the full incremental loop: dedup batch N against the signature
    // artifact, ACCEPT the survivors by appending their signatures, and
    // batch N+1 now dedups against them too — within-crawl cross-batch
    // dedup without ever re-signing the corpus
    import graft.operators.Dedup
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq((100L, "seed reference document about distributed engines"))
      .toDF("doc_id", "text")
    val sigPath = java.nio.file.Files
      .createTempDirectory("graft-stream-sig2").toString + "/sigs"
    Dedup.buildSignatures(corpus, "text", "doc_id", sigPath)

    val input = MemoryStream[(Long, String)]
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val kept = Dedup.dedupAgainstCorpusPrebuilt(spark, sigPath, b.toDF(),
          "text", "doc_id", threshold = 0.5)
        val keptRows = kept.select("doc_id", "text").collect()
        if (keptRows.nonEmpty) {
          import spark.implicits._
          val keptDf = keptRows.map(r => (r.getLong(0), r.getString(1)))
            .toSeq.toDF("doc_id", "text")
          Dedup.appendSignatures(keptDf, "text", "doc_id", sigPath)
        }
        survivors.synchronized { survivors ++= keptRows.map(_.getLong(0)); () }
      }
      .start()

    val novel = "a completely fresh crawl page with brand new unique content here"
    // batch 1: a novel doc — survives and is ACCEPTED into the artifact
    input.addData((1L, novel))
    q.processAllAvailable()
    // batch 2: a near-copy of batch 1's survivor (NOT of the seed corpus)
    // — must now drop, plus another fresh doc that survives
    input.addData((2L, novel),
      (3L, "yet another unrelated page about something else entirely"))
    q.processAllAvailable()
    q.stop()

    assert(survivors.synchronized(survivors.sorted.toSeq) == Seq(1L, 3L),
      s"batch-2 near-copy of an accepted batch-1 doc must drop: $survivors")
  }

  test("streaming substring dedup: spans clean against the gram artifact, " +
       "accepted survivors extend it in place") {
    // the substring-level incremental loop: clean batch N's token spans
    // against the corpus gram index, append the cleaned survivors' grams
    // (one append-mode write — the artifact is never read-modify-
    // rewritten), and batch N+1's copy of a batch-N passage now strips too
    import graft.operators.Dedup
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq((100L, "c1 c2 c3 c4 c5")).toDF("doc_id", "text")
    val gramPath = java.nio.file.Files
      .createTempDirectory("graft-stream-gram").toString + "/grams"
    Dedup.buildGramIndex(corpus, "text", "doc_id", gramPath, k = 3)

    val input = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cleaned = Dedup.substringDedupPrebuilt(spark, gramPath, b.toDF(),
            "text", "doc_id", k = 3)
          .collect().map(r => (r.getLong(0), r.getString(3)))
        val kept = cleaned.filter(_._2.nonEmpty)
        if (kept.nonEmpty) {
          import spark.implicits._
          Dedup.appendGramIndex(
            kept.toSeq.toDF("doc_id", "text"), "text", "doc_id", gramPath, k = 3)
        }
        out.synchronized { out ++= cleaned; () }
      }
      .start()

    // batch 1: a corpus passage inside fresh context + a fully fresh doc
    input.addData((1L, "a1 c1 c2 c3 c4 c5 a2"), (2L, "b1 b2 b3 b4"))
    q.processAllAvailable()
    // batch 2: repeats batch 2's OWN accepted passage b1..b4 — must strip
    // now that batch 1's survivors extended the artifact
    input.addData((3L, "z1 b1 b2 b3 b4 z2"))
    q.processAllAvailable()
    q.stop()

    val byId = out.synchronized(out.toMap)
    assert(byId(1L) == "a1 a2", s"corpus span must strip: ${byId(1L)}")
    assert(byId(2L) == "b1 b2 b3 b4", "fresh doc unchanged in batch 1")
    assert(byId(3L) == "z1 z2",
      s"batch-2 copy of an accepted batch-1 passage must strip: ${byId(3L)}")
  }

  test("streaming index maintenance: crawl batches append to the inverted " +
       "text index; queries between batches see the grown corpus") {
    // the serving loop: ingest crawl batches with appendTextIndex (three
    // append-mode writes, no rebuild), query with bm25TopKPrebuilt between
    // batches — rankings reflect every accepted doc so far
    import graft.operators.TermStats
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext

    val seed = Seq((100L, "spark engine overview")).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-stream-text").toString + "/idx"
    TermStats.buildTextIndex(seed, "text", "doc_id", idx)

    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        TermStats.appendTextIndex(b.toDF(), "text", "doc_id", idx); ()
      }
      .start()

    def hits() = TermStats
      .bm25TopKPrebuilt(spark, idx, "doc_id", Seq("spark"), k = 10)
      .collect().map(_.getLong(0)).toSet

    assert(hits() == Set(100L), "seed corpus only before any batch")
    input.addData((1L, "spark spark tuning notes"), (2L, "unrelated text"))
    q.processAllAvailable()
    assert(hits() == Set(100L, 1L), s"batch-1 doc must rank: ${hits()}")
    input.addData((3L, "more spark content here"))
    q.processAllAvailable()
    q.stop()
    assert(hits() == Set(100L, 1L, 3L), s"batch-2 doc must rank: ${hits()}")
    // and the grown index still equals a cold rebuild over everything
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-stream-text2").toString + "/idx"
    TermStats.buildTextIndex(
      seed.union(Seq((1L, "spark spark tuning notes"), (2L, "unrelated text"),
        (3L, "more spark content here")).toDF("doc_id", "text")),
      "text", "doc_id", rebuilt)
    val a = TermStats.bm25TopKPrebuilt(spark, idx, "doc_id", Seq("spark"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = TermStats.bm25TopKPrebuilt(spark, rebuilt, "doc_id", Seq("spark"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, s"append-grown index drifted from rebuild: $a vs $b")
  }

  test("text index compacts IN PLACE under a live reader: a pre-compact " +
       "DataFrame keeps its version's files, new probes see the compacted " +
       "version, vacuum drops only non-current versions") {
    import graft.operators.TermStats
    val idx = java.nio.file.Files
      .createTempDirectory("graft-cas-text").toString + "/idx"
    val seed = Seq((1L, "spark engine overview"),
      (2L, "unrelated prose entirely")).toDF("doc_id", "text")
    TermStats.buildTextIndex(seed, "text", "doc_id", idx)
    TermStats.appendTextIndex(
      Seq((3L, "spark spark tuning")).toDF("doc_id", "text"),
      "text", "doc_id", idx)
    assert(TermStats.currentIndexVersion(spark, idx).contains(1L))

    // the "live reader": a probe whose plan (and file listing) was built
    // against v=1 BEFORE the compaction flips the pointer
    val preCompact = TermStats
      .bm25TopKPrebuilt(spark, idx, "doc_id", Seq("spark"), k = 10)
    val expected = preCompact.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    TermStats.compactTextIndexInPlace(spark, idx)
    assert(TermStats.currentIndexVersion(spark, idx).contains(2L),
      "compaction must land as the next CAS version")

    // old reader re-collects from its v=1 file list — files untouched
    val stale = preCompact.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stale == expected,
      s"pre-compact reader torn by in-place compaction: $stale vs $expected")
    // fresh probe resolves v=2; results identical (compaction is a layout
    // change, not a semantic one)
    val after = TermStats
      .bm25TopKPrebuilt(spark, idx, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == expected,
      s"compacted index drifted from pre-compact results: $after vs $expected")

    TermStats.vacuumTextIndex(spark, idx)
    val left = new java.io.File(idx).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).toSet
    assert(left == Set("v=2"), s"vacuum must keep only the current version: $left")
    val postVacuum = TermStats
      .bm25TopKPrebuilt(spark, idx, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(postVacuum == expected, "probe must stay green after vacuum")
  }

  test("ChangeFeed-driven index maintenance end to end: each micro-batch's " +
       "NEW events append to the text, gram, AND signature artifacts; " +
       "N streamed batches == one-shot rebuild on every probe") {
    // the full "crawl keeps the serving artifacts fresh" loop: the stream
    // carries corpus writes; foreachBatch diffs the keyed snapshot with
    // ChangeFeed (the reference's per-write NEW/MODIFIED/DELETED algebra,
    // per-batch here), and the NEW rows drive all three append paths under
    // the single-writer contract (sequential inside one batch callback).
    // This pins the RAW appends' happy path (N batches == rebuild); the
    // production form of this exact loop uses the appendXxxOnce replay
    // guards — crash/replay behavior is pinned by the two tests below.
    import graft.operators.{Dedup, TermStats}
    import graft.streaming.ChangeFeed
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-maint").toString
    val textIdx = s"$dir/text"
    val gramIdx = s"$dir/grams"
    val sigIdx = s"$dir/sigs"

    val seedRows = Seq(
      (100L, "spark engine overview with storage layout details inside the core"))
    TermStats.buildTextIndex(seedRows.toDF("doc_id", "text"), "text", "doc_id", textIdx)
    Dedup.buildGramIndex(seedRows.toDF("doc_id", "text"), "text", "doc_id", gramIdx)
    Dedup.buildSignatures(seedRows.toDF("doc_id", "text"), "text", "doc_id", sigIdx)

    // maintained keyed snapshot (driver-side rows — a test-sized corpus;
    // the production form keeps the snapshot as a table and diffs lazily)
    var corpus = seedRows

    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batchRows = b.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        val newRows = corpus ++ batchRows
        val fresh = ChangeFeed.diff(
            corpus.toDF("doc_id", "text"), newRows.toDF("doc_id", "text"), "doc_id")
          .filter(col("_status") === ChangeFeed.New)
          .select(col("doc_id"), col("text"))
        TermStats.appendTextIndex(fresh, "text", "doc_id", textIdx)
        Dedup.appendGramIndex(fresh, "text", "doc_id", gramIdx)
        Dedup.appendSignatures(fresh, "text", "doc_id", sigIdx)
        corpus = newRows
        ()
      }
      .start()

    // batch 1: two fresh docs (one spark-ish for the BM25 probe, one long
    // passage the gram probe will repeat)
    input.addData(
      (1L, "spark spark tuning notes for shuffle heavy pipelines at scale"),
      (2L, "the quick brown fox jumps over the lazy dog every single morning"))
    q.processAllAvailable()
    // batch 2: one more doc, near-duplicate of doc 2 (signature probe prey)
    input.addData(
      (3L, "the quick brown fox jumps over the lazy dog every single evening"))
    q.processAllAvailable()
    q.stop()
    assert(corpus.map(_._1).toSet == Set(100L, 1L, 2L, 3L))

    // one-shot rebuilds over the final corpus — the equality baselines
    val all = corpus.toDF("doc_id", "text")
    val textIdx2 = s"$dir/text2"; val gramIdx2 = s"$dir/grams2"
    val sigIdx2 = s"$dir/sigs2"
    TermStats.buildTextIndex(all, "text", "doc_id", textIdx2)
    Dedup.buildGramIndex(all, "text", "doc_id", gramIdx2)
    Dedup.buildSignatures(all, "text", "doc_id", sigIdx2)

    // text probe: identical BM25 rankings (scores included)
    def bm25(idx: String) = TermStats
      .bm25TopKPrebuilt(spark, idx, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bm25(textIdx) == bm25(textIdx2),
      s"text index drifted: ${bm25(textIdx)} vs ${bm25(textIdx2)}")
    assert(bm25(textIdx).map(_._1).contains(1L),
      "batch-1 doc must rank for 'spark'")

    // gram probe: an incoming doc repeating a STREAMED passage strips
    // identically against grown and rebuilt artifacts
    val incoming = Seq(
      (50L, "intro words then the quick brown fox jumps over the lazy dog every single morning"))
      .toDF("doc_id", "text")
    def strip(idx: String) = Dedup
      .substringDedupPrebuilt(spark, idx, incoming, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(strip(gramIdx) == strip(gramIdx2),
      s"gram index drifted: ${strip(gramIdx)} vs ${strip(gramIdx2)}")

    // signature probe: dedup a near-duplicate of a STREAMED doc against
    // the corpus signatures — same verdicts from grown and rebuilt
    val crawl = Seq((60L, "the quick brown fox jumps over the lazy dog every single morning today"))
      .toDF("doc_id", "text")
    def verdicts(idx: String) = Dedup
      .dedupAgainstCorpusPrebuilt(spark, idx, crawl, "text", "doc_id",
        threshold = 0.5)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(verdicts(sigIdx) == verdicts(sigIdx2),
      s"signature index drifted: ${verdicts(sigIdx)} vs ${verdicts(sigIdx2)}")
  }

  test("replayed micro-batch after a mid-batch crash (text appended, grams " +
       "not) appends exactly once: the replay no-ops the committed artifact, " +
       "completes the torn one, and every probe == one-shot rebuild") {
    // foreachBatch is at-least-once: a batch that dies BETWEEN artifact
    // appends is re-delivered wholesale, and raw re-appends double-count
    // BM25 df/tf (silently inflated scores). This drives the real
    // crash-restart-replay loop through a checkpointed query: batch 1's
    // first attempt throws after the text append, the restarted query
    // replays batch 1, and the (runId, batchId) guards make the net effect
    // exactly-once on BOTH artifacts.
    import graft.operators.{Dedup, TermStats}
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files
      .createTempDirectory("graft-replay-maint").toString
    val textIdx = s"$dir/text"; val gramIdx = s"$dir/grams"
    val ckpt = s"$dir/ckpt"
    val runId = ckpt // restart-stable (the SnapshotSink rule)

    val seed = Seq((100L, "spark engine overview with storage details"))
    TermStats.buildTextIndex(seed.toDF("doc_id", "text"), "text", "doc_id", textIdx)
    Dedup.buildGramIndex(seed.toDF("doc_id", "text"), "text", "doc_id", gramIdx)

    val batch1 = Seq(
      (1L, "spark spark tuning notes for shuffle heavy pipelines at scale"),
      (2L, "the quick brown fox jumps over the lazy dog every single morning"))

    @volatile var crashOnce = true
    val input = MemoryStream[(Long, String)]
    def mkQuery() = input.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        TermStats.appendTextIndexOnce(b.toDF(), "text", "doc_id", textIdx,
          runId, id)
        if (id == 1L && crashOnce) {
          crashOnce = false
          throw new RuntimeException("injected crash between artifact appends")
        }
        Dedup.appendGramIndexOnce(b.toDF(), "text", "doc_id", gramIdx,
          runId, id)
        ()
      }
      .start()

    val q1 = mkQuery()
    input.addData((10L, "warmup batch so the crash batch is a replayed id"))
    q1.processAllAvailable()
    input.addData(batch1: _*)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(!crashOnce, "the injected crash must have fired on batch 1")

    // restart from the same checkpoint: batch 1 is re-delivered (at-least-
    // once), the text append no-ops on its marker, the gram append lands
    val q2 = mkQuery()
    q2.processAllAvailable()
    q2.stop()

    val all = (seed ++ Seq((10L, "warmup batch so the crash batch is a replayed id")) ++ batch1)
      .toDF("doc_id", "text")
    val textIdx2 = s"$dir/text2"; val gramIdx2 = s"$dir/grams2"
    TermStats.buildTextIndex(all, "text", "doc_id", textIdx2)
    Dedup.buildGramIndex(all, "text", "doc_id", gramIdx2)

    def bm25(idx: String) = TermStats
      .bm25TopKPrebuilt(spark, idx, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bm25(textIdx) == bm25(textIdx2),
      s"replayed text append double-counted: ${bm25(textIdx)} vs ${bm25(textIdx2)}")

    val incoming = Seq(
      (50L, "intro words then the quick brown fox jumps over the lazy dog every single morning"))
      .toDF("doc_id", "text")
    def strip(idx: String) = Dedup
      .substringDedupPrebuilt(spark, idx, incoming, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(strip(gramIdx) == strip(gramIdx2),
      s"torn gram append not completed by the replay: ${strip(gramIdx)} vs ${strip(gramIdx2)}")
  }

  test("crash INSIDE an append at every protocol step (staged / intent / " +
       "half-moved / all-moved-no-marker) replays without double-counting: " +
       "final index == one-shot rebuild") {
    // the intra-artifact tear: an appendTextIndexOnce writes FOUR tables;
    // dying after some postings files moved but before the marker leaves a
    // torn live dir. The intent manifest must let the replay remove exactly
    // the torn attempt's files — the "moved" point is the sharpest case:
    // every file landed, only the marker is missing, and a naive replay
    // would double every df/tf partial.
    import graft.operators.{IndexLifecycle, TermStats}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-replay-torn").toString
    val idx = s"$dir/idx"
    val runId = "torn-run"
    TermStats.buildTextIndex(
      Seq((100L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx)

    val batches = Seq(
      (1L, Seq((1L, "spark spark tuning notes")), "staged"),
      (2L, Seq((2L, "unrelated text entirely")), "intent"),
      (3L, Seq((3L, "more spark content here")), "half-moved"),
      (4L, Seq((4L, "spark at scale again")), "moved"))
    batches.foreach { case (id, rows, failAt) =>
      intercept[IllegalStateException] {
        TermStats.appendTextIndexOnceAt(rows.toDF("doc_id", "text"),
          "text", "doc_id", idx, runId, id, failAt)
      }
      assert(IndexLifecycle.lastAppendedBatch(spark, idx, runId) != Some(id),
        s"batch $id must NOT be marked committed after failpoint $failAt")
      assert(TermStats.appendTextIndexOnce(rows.toDF("doc_id", "text"),
        "text", "doc_id", idx, runId, id),
        s"replay of torn batch $id (failpoint $failAt) must append")
    }
    assert(IndexLifecycle.lastAppendedBatch(spark, idx, runId) == Some(4L))

    // replays of committed batches are pure no-ops
    batches.foreach { case (id, rows, _) =>
      assert(!TermStats.appendTextIndexOnce(rows.toDF("doc_id", "text"),
        "text", "doc_id", idx, runId, id),
        s"re-replay of committed batch $id must no-op")
    }

    val all = (Seq((100L, "spark engine overview")) ++
      batches.flatMap(_._2)).toDF("doc_id", "text")
    val idx2 = s"$dir/idx2"
    TermStats.buildTextIndex(all, "text", "doc_id", idx2)
    def bm25(p: String) = TermStats
      .bm25TopKPrebuilt(spark, p, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bm25(idx) == bm25(idx2),
      s"torn-replay index drifted from rebuild: ${bm25(idx)} vs ${bm25(idx2)}")

    // a DIFFERENT run's batch 1 is new progress, not a replay (batchIds
    // are only compared within one runId — the fresh-checkpoint rule)
    assert(TermStats.appendTextIndexOnce(
      Seq((5L, "fresh checkpoint run")).toDF("doc_id", "text"),
      "text", "doc_id", idx, "other-run", 1L),
      "a new runId's batch 1 must append, not no-op on the old run's marker")
  }

  test("a rebuild/compact REFUSES while a torn append is pending (it would " +
       "orphan the partial files and the replay would double-count); " +
       "abandonTornAppends discards the attempt and un-marks the batch") {
    import graft.operators.{IndexLifecycle, TermStats}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-torn-compact").toString
    val idx = s"$dir/idx"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx)
    val batch = Seq((2L, "spark spark tuning")).toDF("doc_id", "text")
    intercept[IllegalStateException] {
      TermStats.appendTextIndexOnceAt(batch, "text", "doc_id", idx,
        "dead-run", 0L, failAt = "half-moved")
    }
    // both compaction forms must refuse (in-place via nextVersion, the
    // cross-path form via its source check) and a rebuild too
    val e1 = intercept[IllegalArgumentException] {
      TermStats.compactTextIndexInPlace(spark, idx)
    }
    assert(e1.getMessage.contains("torn append"), s"$e1")
    val e2 = intercept[IllegalArgumentException] {
      TermStats.compactTextIndex(spark, idx, s"$dir/out")
    }
    assert(e2.getMessage.contains("torn append"), s"$e2")
    val e3 = intercept[IllegalArgumentException] {
      TermStats.buildTextIndex(
        Seq((1L, "x")).toDF("doc_id", "text"), "text", "doc_id", idx)
    }
    assert(e3.getMessage.contains("torn append"), s"$e3")

    // abandon: the artifact reads as if the batch never ran, the batch id
    // is NOT marked committed (abandon discards the attempt, not the
    // data's claim), and a later replay of the same id appends cleanly
    val dropped = IndexLifecycle.abandonTornAppends(spark, idx)
    assert(dropped.nonEmpty, "abandon must report what it discarded")
    assert(IndexLifecycle.pendingIntents(spark, idx).isEmpty)
    assert(IndexLifecycle.lastAppendedBatch(spark, idx, "dead-run").isEmpty)
    def bm25(p: String) = TermStats
      .bm25TopKPrebuilt(spark, p, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cleanIdx = s"$dir/clean"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", cleanIdx)
    assert(bm25(idx) == bm25(cleanIdx),
      "abandoned artifact must equal its pre-batch state")
    assert(TermStats.appendTextIndexOnce(batch, "text", "doc_id", idx,
      "dead-run", 0L), "post-abandon replay must append, not no-op")
    TermStats.compactTextIndexInPlace(spark, idx) // now clean: compacts fine
    TermStats.appendTextIndex(batch.withColumn("doc_id", col("doc_id") + 10),
      "text", "doc_id", idx)
  }

  test("an intent left by a crash AFTER the marker write is committed " +
       "debris, not a torn append: compaction is not blocked, and abandon " +
       "sweeps only the manifest — NEVER the committed batch's live files") {
    import graft.operators.{IndexLifecycle, TermStats}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-marked-debris").toString
    val idx = s"$dir/idx"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx)
    val batch = Seq((2L, "spark spark tuning")).toDF("doc_id", "text")
    intercept[IllegalStateException] {
      TermStats.appendTextIndexOnceAt(batch, "text", "doc_id", idx,
        "run-a", 0L, failAt = "marked")
    }
    // committed: marker written, data live, only cleanup was lost
    assert(IndexLifecycle.lastAppendedBatch(spark, idx, "run-a") == Some(0L))
    assert(IndexLifecycle.pendingIntents(spark, idx).isEmpty,
      "a committed batch's leftover intent must not read as torn")
    // compaction proceeds over committed debris (nextVersion must not
    // refuse on it) — run BEFORE the replay, which cleans the debris
    TermStats.compactTextIndexInPlace(spark, idx)
    assert(!TermStats.appendTextIndexOnce(batch, "text", "doc_id", idx,
      "run-a", 0L), "replay must still no-op on the marker")

    // recreate the debris state, then abandon: the manifest goes, the
    // committed batch's rows must SURVIVE (the data-loss hazard)
    val idx2 = s"$dir/idx2"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx2)
    intercept[IllegalStateException] {
      TermStats.appendTextIndexOnceAt(batch, "text", "doc_id", idx2,
        "run-a", 0L, failAt = "marked")
    }
    IndexLifecycle.abandonTornAppends(spark, idx2)
    def bm25(p: String) = TermStats
      .bm25TopKPrebuilt(spark, p, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rebuilt = s"$dir/rebuilt"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview"), (2L, "spark spark tuning"))
        .toDF("doc_id", "text"),
      "text", "doc_id", rebuilt)
    assert(bm25(idx2) == bm25(rebuilt),
      "abandon deleted a COMMITTED batch's live files")
    assert(bm25(idx) == bm25(rebuilt),
      "compacted-over-debris artifact must carry the committed batch")
  }

  test("a 32-bit runTag collision cannot silently no-op another run's " +
       "batch: the marker's stored raw runId is compared, a mismatch reads " +
       "as NO marker, and the batch appends") {
    // the r15 known nit: markers are ADDRESSED by an 8-hex md5 tag; two
    // distinct runIds colliding on the tag (p ≈ 2⁻³²) must not let run B
    // no-op on run A's high-water mark — that is silent data loss inside
    // the very protocol built to prevent it. Simulate the collision by
    // planting a marker at MY tag address stamped with ANOTHER raw runId.
    import graft.operators.{IndexLifecycle, TermStats}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tag-collision").toString
    val idx = s"$dir/idx"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx)
    val myRun = "my-checkpoint"
    val tag = IndexLifecycle.runTag(myRun)
    val appends = java.nio.file.Paths.get(idx, "_appends")
    java.nio.file.Files.createDirectories(appends)
    java.nio.file.Files.write(appends.resolve(s"run-$tag"),
      "7\nother-colliding-run\n0".getBytes("UTF-8"))
    assert(IndexLifecycle.lastAppendedBatch(spark, idx, myRun).isEmpty,
      "a marker stamped with another runId must read as absent")
    // batchId 3 ≤ 7: a first-line-only read would no-op (dropping the
    // batch); the collision-checked read must APPEND
    val batch = Seq((2L, "spark spark tuning")).toDF("doc_id", "text")
    assert(TermStats.appendTextIndexOnce(batch, "text", "doc_id", idx,
      myRun, 3L), "colliding-tag batch must append, not no-op")
    assert(IndexLifecycle.lastAppendedBatch(spark, idx, myRun) == Some(3L),
      "the committed marker now belongs to THIS run")
    val idx2 = s"$dir/rebuilt"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview"), (2L, "spark spark tuning"))
        .toDF("doc_id", "text"), "text", "doc_id", idx2)
    def bm25(p: String) = TermStats
      .bm25TopKPrebuilt(spark, p, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bm25(idx) == bm25(idx2),
      "post-collision artifact must equal the exactly-once rebuild")

    // the torn-intent classifier is equally collision-proof: an intent
    // whose #runId header differs from the same-tag marker's raw runId
    // must classify TORN (committed-debris status would hand its partial
    // files to abandonTornAppends as live data)
    java.nio.file.Files.write(appends.resolve(s"intent-$tag-2"),
      "#runId:some-other-run".getBytes("UTF-8"))
    assert(IndexLifecycle.pendingIntents(spark, idx)
      .contains(s"intent-$tag-2"),
      "a same-tag/different-runId intent below the marker must stay torn")
    // while a matching-runId intent below the marker IS committed debris
    java.nio.file.Files.write(appends.resolve(s"intent-$tag-1"),
      s"#runId:$myRun".getBytes("UTF-8"))
    assert(!IndexLifecycle.pendingIntents(spark, idx)
      .contains(s"intent-$tag-1"),
      "a matching-runId intent below the marker is committed debris")
    IndexLifecycle.abandonTornAppends(spark, idx)
  }

  test("appendOnce REFUSES while a torn append from ANOTHER run is " +
       "pending (appending on top would bury the partial files its replay " +
       "must remove); the torn run's own replay still self-heals") {
    import graft.operators.TermStats
    val dir = java.nio.file.Files
      .createTempDirectory("graft-foreign-intent").toString
    val idx = s"$dir/idx"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx)
    val torn = Seq((2L, "spark spark tuning")).toDF("doc_id", "text")
    intercept[IllegalStateException] {
      TermStats.appendTextIndexOnceAt(torn, "text", "doc_id", idx,
        "dead-run", 0L, failAt = "half-moved")
    }
    val mine = Seq((3L, "more spark content")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      TermStats.appendTextIndexOnce(mine, "text", "doc_id", idx,
        "live-run", 0L)
    }
    assert(e.getMessage.contains("another run"), s"$e")
    // the torn run's own replay self-heals, after which the other run
    // proceeds — final state == exactly-once rebuild of all three docs
    assert(TermStats.appendTextIndexOnce(torn, "text", "doc_id", idx,
      "dead-run", 0L))
    assert(TermStats.appendTextIndexOnce(mine, "text", "doc_id", idx,
      "live-run", 0L))
    val idx2 = s"$dir/rebuilt"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview"), (2L, "spark spark tuning"),
        (3L, "more spark content")).toDF("doc_id", "text"),
      "text", "doc_id", idx2)
    def bm25(p: String) = TermStats
      .bm25TopKPrebuilt(spark, p, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bm25(idx) == bm25(idx2))
  }

  test("crashed-writeAtomic tmp debris and corrupt foreign markers do " +
       "not wedge the protocol: classification skips them, replay " +
       "proceeds, abandonTornAppends sweeps the debris") {
    // a writer dying between create and rename inside writeAtomic leaves
    // `<name>.tmp.<uuid>` in _appends; a FS glitch can truncate a marker.
    // Neither is this run's problem: classifying them would block every
    // replay (the self-heal contract) until manual cleanup.
    import graft.operators.{IndexLifecycle, TermStats}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tmp-debris").toString
    val idx = s"$dir/idx"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx)
    val appends = java.nio.file.Paths.get(idx, "_appends")
    java.nio.file.Files.createDirectories(appends)
    // zero-byte marker tmp (crash mid-write), torn-looking intent tmp,
    // and a corrupt (non-numeric) marker of some dead foreign run
    java.nio.file.Files.write(
      appends.resolve("run-00000000.tmp.deadbeef"), Array.empty[Byte])
    java.nio.file.Files.write(
      appends.resolve("intent-00000000-3.tmp.deadbeef"),
      "#runId:ghost".getBytes("UTF-8"))
    java.nio.file.Files.write(appends.resolve("run-ffffffff"),
      "garbage-not-a-number".getBytes("UTF-8"))
    // none of it is pending, none of it blocks an append or a compact
    assert(IndexLifecycle.pendingIntents(spark, idx).isEmpty,
      "tmp debris must not classify as torn intents")
    assert(TermStats.appendTextIndexOnce(
      Seq((2L, "spark spark tuning")).toDF("doc_id", "text"),
      "text", "doc_id", idx, "live-run", 0L),
      "debris must not block a live run's append")
    TermStats.compactTextIndexInPlace(spark, idx)
    // a corrupt marker's OWN intents classify torn (no laundering into
    // committed debris), keeping the orderly refusal path
    java.nio.file.Files.write(appends.resolve("intent-ffffffff-0"),
      "#runId:dead".getBytes("UTF-8"))
    assert(IndexLifecycle.pendingIntents(spark, idx)
      .contains("intent-ffffffff-0"),
      "an intent under a corrupt marker must stay torn")
    // the audit view degrades rather than crashes, and abandon sweeps
    // both the torn intent and the tmp debris
    assert(IndexLifecycle.runMarkers(spark, idx).exists(_._2 == "live-run"))
    IndexLifecycle.abandonTornAppends(spark, idx)
    assert(IndexLifecycle.pendingIntents(spark, idx).isEmpty)
    val left = java.nio.file.Files.list(appends).toArray.map(_.toString)
    assert(!left.exists(_.contains(".tmp.")),
      s"abandon must sweep writeAtomic debris: ${left.mkString(", ")}")
  }

  test("an EMPTY micro-batch commits through appendOnce: the marker " +
       "advances (so later batches are not mistaken for a resume) and " +
       "the artifact serves unchanged") {
    // foreachBatch delivers empty batches (idle triggers); the protocol
    // must record their progress — a driver that skips them leaves holes
    // the restore fence reads as a mid-stream resume
    import graft.operators.{IndexLifecycle, TermStats}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-empty-batch").toString
    val idx = s"$dir/idx"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx)
    def bm25() = TermStats
      .bm25TopKPrebuilt(spark, idx, "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = bm25()
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TermStats.appendTextIndexOnce(empty, "text", "doc_id", idx,
      "empty-run", 0L), "an empty batch still commits")
    assert(IndexLifecycle.lastAppendedBatch(spark, idx, "empty-run")
      == Some(0L), "the marker must advance past the empty batch")
    assert(bm25() == before, "an empty append must not change the served data")
    assert(IndexLifecycle.pendingIntents(spark, idx).isEmpty)
    // and the next real batch appends normally on top
    assert(TermStats.appendTextIndexOnce(
      Seq((2L, "spark spark tuning")).toDF("doc_id", "text"),
      "text", "doc_id", idx, "empty-run", 1L))
    assert(bm25() != before)
  }

  test("auditArtifacts reports replay state per artifact: run markers " +
       "(tag, raw runId, last batch) and the restore epoch") {
    import graft.operators.{IndexLifecycle, TermStats}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-audit-replay").toString
    val idx = s"$dir/idx"
    TermStats.buildTextIndex(
      Seq((1L, "spark engine overview")).toDF("doc_id", "text"),
      "text", "doc_id", idx)
    TermStats.appendTextIndexOnce(
      Seq((2L, "spark tuning")).toDF("doc_id", "text"),
      "text", "doc_id", idx, "audit-run", 0L)
    TermStats.appendTextIndexOnce(
      Seq((3L, "spark at scale")).toDF("doc_id", "text"),
      "text", "doc_id", idx, "audit-run", 1L)
    def auditRow() = IndexLifecycle.auditArtifacts(spark, dir)
      .collect().find(_.getString(0).endsWith("/idx")).get
    val row = auditRow()
    val markers = row.getSeq[org.apache.spark.sql.Row](6)
    assert(markers.map(m => (m.getString(0), m.getString(1), m.getLong(2)))
      == Seq((IndexLifecycle.runTag("audit-run"), "audit-run", 1L)),
      s"unexpected run_markers: $markers")
    assert(row.getLong(7) == 0L, "never-restored artifact: epoch 0")
    IndexLifecycle.markRestored(spark, idx, "test-restore")
    assert(auditRow().getLong(7) == 1L,
      "restore epoch must surface in the audit")
  }

  test("streaming crawl keeps the PQ serving index fresh: appended " +
       "micro-batches == one-shot rebuild with the same frozen codebook") {
    // the vector half of the maintenance loop (the text half is the test
    // above): an embedding stream drives appendPqIndex per micro-batch
    // under the single-writer contract; the frozen codebook guarantees
    // N streamed appends are probe-indistinguishable from one build over
    // the final corpus with that codebook
    import graft.operators.Similarity
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext

    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val seed = emb.filter(col("vec_id") >= 200)

    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-pq").toString
    val idx = s"$dir/idx"
    val cb = Similarity.pqBuild(seed, "embedding", "vec_id", idx,
      m = 8, ksub = 16, dim = 64)

    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDS().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Similarity.appendPqIndex(b, "embedding", "vec_id", idx,
          m = 8, dim = 64)
        ()
      }
      .start()

    def feed(df: org.apache.spark.sql.DataFrame): Unit = {
      input.addData(df.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq: _*)
      q.processAllAvailable()
    }
    feed(emb.filter(col("vec_id") < 100))
    feed(emb.filter(col("vec_id") >= 100 && col("vec_id") < 200))
    q.stop()

    val rebuilt = s"$dir/rebuilt"
    Similarity.pqBuildWith(emb, "embedding", "vec_id", rebuilt, cb,
      m = 8, dim = 64)

    val queryVec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    def probe(p: String) = Similarity
      .pqTopKPrebuilt(spark, p, "vec_id", queryVec, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val grown = probe(idx)
    assert(grown == probe(rebuilt),
      s"stream-grown PQ index drifted from rebuild: $grown vs ${probe(rebuilt)}")
    // the streamed rows actually serve: the query vector itself arrived
    // via the stream (vec_id 0 in batch 1), so it must rank for itself
    assert(grown.map(_._1).contains(0L),
      "streamed batch rows never entered the serving index")
  }
}

/** Top-level: Dataset deserialization (.as[KV2]) cannot encode an
  * inner class without its outer scope. */
case class KV2(key: String, v: Double)

/** Static per-JVM sink for the per-event subscribe pin: the ForeachWriter
  * closure ships to executors, so the collection point must be reachable
  * statically (local[32] = same JVM). */
object StreamingSpecSink {
  val q = new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.StatefulFeed.Change]()
  def deliver(c: graft.streaming.StatefulFeed.Change): Unit = { q.add(c); () }
}
