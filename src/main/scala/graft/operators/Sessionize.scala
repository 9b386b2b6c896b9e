package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch sessionization: assign gap-based session ids to an event log.
 *
 * The streaming side of the engine already has `session_window`
 * (SparkEntry q_session_window) — this is the BATCH formulation that also
 * hands back a stable per-user session ID usable as a join key: an event
 * starts a new session when it is its user's first, or when the gap to the
 * previous event reaches `gapSeconds` (>= — the same half-open boundary
 * rule as `session_window`'s [start, end), so the two formulations place
 * every event in the same session); the session id is the running count of
 * session starts, expressed as plain window functions so any SQL engine
 * can replay it.
 *
 * Scale shape: one hash shuffle on the user key; the lag and the running
 * sum share that single exchange (same partitioning + ordering), and the
 * per-session rollup re-uses the same key prefix. Timestamps compare in
 * integer MICROSECONDS (`unix_micros`) — no float epoch, no truncation
 * disagreements across engines.
 */
object Sessionize {

  /** Events + `session_id` (1-based per user, in time order). `tieCol`
    * breaks equal-timestamp ties so the ordering — and with it every
    * session id — is total and engine-independent. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             tieCol: String, gapSeconds: Long): DataFrame = {
    require(!events.columns.contains("_new"),
      "input must not contain the reserved internal column _new")
    // the OUTPUT name gets the same guard: an upstream session_id would
    // be silently overwritten by the withColumn below (and sessions()
    // would then group on the recomputed values) — the exact hazard the
    // _new guard exists for, one column over
    require(!events.columns.contains("session_id"),
      "input already contains a session_id column — rename it before " +
        "re-sessionizing, or the upstream assignment would be " +
        "silently overwritten")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val micros = unix_micros(col(tsCol))
    val prev = lag(micros, 1).over(w)
    val starts = when(
      prev.isNull || micros - prev >= gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("_new", starts)
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("_new")
  }

  /** One row per session: event count + [start, end] bounds. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               tieCol: String, gapSeconds: Long): DataFrame =
    assign(events, userCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
