package graft

import java.util.concurrent.ConcurrentHashMap

/**
 * Event-to-delivery latency probe for the streaming change feed (test
 * scope, never shipped): measures the documented one-micro-batch-cycle
 * floor of [[graft.streaming.StatefulFeed.subscribe]] under
 * Trigger.ProcessingTime(0) with real numbers, so the platform-limit note
 * (SURVEY §7.4.2 — the reference pushes per-write events in µs; Spark
 * delivers at micro-batch cadence) carries data like every BENCH_NOTES
 * law.
 *
 * Method: one write at a time through a MemoryStream; the driver stamps
 * t0 just before addData, the ForeachWriter stamps delivery into a shared
 * map (same JVM — local mode only), and the driver spin-waits for the
 * stamp before issuing the next write. That measures the full
 * write→plan→execute→deliver cycle per event with no batching overlap —
 * the worst case (a loaded feed amortizes the cycle over many events).
 */
object LatencyProbe {

  val delivered = new ConcurrentHashMap[Long, Long]() // seq -> nanoTime

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100
    val spark = EngineSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.StatefulFeed
    import graft.streaming.StatefulFeed.{Change, Command}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val input = MemoryStream[Command]
    val q = StatefulFeed.subscribe(
      StatefulFeed.changeFeed(input.toDS()),
      (c: Change) => { delivered.put(c.seq, System.nanoTime()); () })
      .start()

    // warmup: first batches pay planner/codegen/state-store init
    for (i <- 1L to 10L) {
      input.addData(Command("w", i, "U", s"v$i"))
      while (!delivered.containsKey(i)) Thread.sleep(1)
    }
    delivered.clear()

    val lats = (101L to (100L + n)).map { i =>
      val t0 = System.nanoTime()
      input.addData(Command("k", i, "U", s"v$i"))
      while (!delivered.containsKey(i)) Thread.`yield`()
      (delivered.get(i) - t0) / 1e6 // ms
    }.sorted
    q.stop()

    def pct(p: Double) = lats(math.min(lats.size - 1, (p * lats.size).toInt))
    println(f"[latency] n=$n min=${lats.head}%.1fms p50=${pct(0.5)}%.1fms " +
      f"p95=${pct(0.95)}%.1fms max=${lats.last}%.1fms")
    spark.stop()
  }
}
