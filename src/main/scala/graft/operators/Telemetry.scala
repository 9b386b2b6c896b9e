package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Engine telemetry — the Spark-native analogue of the reference's
 * telemetry RPC family (reference: proto/hydraide.proto:566-609
 * SubscribeToTelemetry / GetTelemetryHistory / GetErrorDetails /
 * GetTelemetryStats). The reference streams server-side metrics; here the
 * engine IS the session, so telemetry hooks Spark's QueryExecutionListener:
 * every action is recorded (name, wall time, success/error) into a bounded
 * in-memory ring, queryable as DataFrames — history, error details, and
 * aggregate stats — plus a subscribe callback for live consumption.
 *
 * Deliberately driver-local and bounded: metrics are per-session metadata
 * (thousands of rows), not data-plane state — nothing here touches
 * executors or scales with input size.
 */
object Telemetry {

  final case class QueryRecord(
      fn: String, startedAtMs: Long, durationMs: Double, error: String)

  private val maxRecords = 10000
  private val records = new ConcurrentLinkedQueue[QueryRecord]
  // O(1) ring size: ConcurrentLinkedQueue.size TRAVERSES the whole list —
  // at steady state (full ring) that was a ~10k-node walk per recorded
  // action, on Spark's listener-bus thread
  private val ringSize = new java.util.concurrent.atomic.AtomicInteger(0)
  private def enqueue(r: QueryRecord): Unit = {
    records.add(r); ringSize.incrementAndGet()
  }
  private def dequeue(): QueryRecord = {
    val r = records.poll()
    if (r != null) ringSize.decrementAndGet()
    r
  }
  // install() must be per SESSION, not process-global: a singleton boolean
  // silently no-ops the second session (spark.newSession(), a test
  // harness's fresh session) and its queries are never recorded. Weak keys
  // on the session OBJECT, not identityHashCode: two live sessions can
  // share a hash (silently skipping the second), and a stopped session's
  // hash lingering in a plain set would skip a future session that reuses
  // it — weak references cannot collide and clear themselves on GC
  private val installedSessions =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()
  @volatile private var subscriber: QueryRecord => Unit = _ => ()

  private def record(r: QueryRecord): Unit = {
    enqueue(r)
    while (ringSize.get() > maxRecords) dequeue() // bounded ring
    subscriber(r)
  }

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      // the listener fires at COMPLETION: the start is now - duration
      // (stamping now as startedAtMs shifted every record by its own
      // duration and could order overlapping queries backwards)
      val ms = durationNs / 1e6
      record(QueryRecord(funcName,
        System.currentTimeMillis() - math.round(ms), ms, null))
    }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      record(QueryRecord(funcName, System.currentTimeMillis(), 0.0,
        String.valueOf(exception)))
  }

  /** Install the listener on the session (idempotent per session). */
  def install(spark: SparkSession): Unit = {
    val first = installedSessions.synchronized {
      installedSessions.put(spark, java.lang.Boolean.TRUE) == null
    }
    if (first) spark.listenerManager.register(listener)
  }

  /** SubscribeToTelemetry: live per-record callback (single subscriber). */
  def subscribe(f: QueryRecord => Unit): Unit = subscriber = f

  /** GetTelemetryHistory: every recorded action as a DataFrame. */
  def history(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    records.iterator().asScala.toSeq.toDF()
  }

  /** GetErrorDetails: the failed actions only. */
  def errors(spark: SparkSession): DataFrame =
    history(spark).filter("error IS NOT NULL")

  /** GetTelemetryStats: per-action-kind aggregate (count, mean/max ms). */
  def stats(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    history(spark).groupBy(col("fn"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("durationMs")), 3).as("mean_ms"),
        round(max(col("durationMs")), 3).as("max_ms"),
        count(when(col("error").isNotNull, 1)).as("n_errors"))
  }

  /**
   * Durable history: append the current ring to a parquet table and clear
   * it (GetTelemetryHistory across restarts, proto:576-584 — the reference
   * persists telemetry server-side; here the session is the server, so
   * durability is an explicit flush). Returns rows flushed. Call it
   * periodically or at session teardown; the parquet table is queryable
   * with plain `spark.read.parquet`.
   */
  def flushHistory(spark: SparkSession, path: String): Long = {
    // drain FIRST (atomic per record): nothing recorded during the write —
    // including the flush's own actions — can be lost or double-flushed.
    // On a failed write the drained batch is put back, so telemetry is
    // never silently dropped by a bad path / full disk. Flushed rows are
    // SORTED by startedAtMs so the durable table is time-ordered no matter
    // how the ring was interleaved by concurrent listener threads.
    val drained = Iterator.continually(dequeue()).takeWhile(_ != null)
      .toSeq.sortBy(_.startedAtMs)
    if (drained.nonEmpty) {
      import spark.implicits._
      try drained.toDF().write.mode("append").parquet(path)
      catch {
        case e: Throwable =>
          // restore the ring on failure. Ordering here is BEST-EFFORT: the
          // listener thread can enqueue between this second drain and the
          // re-add below, landing an out-of-order record — harmless,
          // because the durable order is imposed by the sort at the NEXT
          // flush, not by ring position. If drained + arrived exceeds the
          // ring bound the OLDEST restored records are trimmed (the same
          // record the ring would have evicted had the flush never run).
          val arrived = Iterator.continually(dequeue())
            .takeWhile(_ != null).toSeq
          (drained ++ arrived).sortBy(_.startedAtMs).foreach(enqueue)
          while (ringSize.get() > maxRecords) dequeue()
          throw e
      }
    }
    drained.size.toLong
  }

  /** Test/maintenance hook. */
  def clear(): Unit = {
    records.clear(); ringSize.set(0)
  }
}
