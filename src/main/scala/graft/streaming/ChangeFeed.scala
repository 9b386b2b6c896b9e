package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Subscribe/CDC semantics (reference: proto/hydraide.proto:755-801,
 * app/server/gateway/gateway.go:1597-1727 — every write emits
 * NEW/MODIFIED/DELETED with the old value to subscribers, FIFO per swamp).
 *
 * Spark is micro-batch: the per-write push becomes a per-batch change set.
 * The kernel below computes the exact event rows (status, new, old) between
 * two keyed snapshots; the streaming layer applies it inside foreachBatch
 * against maintained state, giving the same event algebra with batch
 * latency (documented divergence, SURVEY.md §7.4-2).
 */
object ChangeFeed {

  val New = "NEW"
  val Modified = "MODIFIED"
  val Deleted = "DELETED"

  /**
   * Event rows between snapshots: full-outer join on the key; one output row
   * per changed key with status + old/new value columns (`<c>` = new,
   * `old_<c>` = old). Unchanged keys emit nothing — same as the reference,
   * which only notifies on actual content change (swamp.go:2152,2214).
   *
   * Null-key rows are EXCLUDED by contract (the batch Shift null-key
   * rule, stated here because it was previously only implicit): a null
   * key can never pair in the equi-join, and presence is detected by key
   * non-nullness — without the explicit strip such rows silently fell
   * through every status branch and their changes never surfaced.
   */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String): DataFrame = {
    val valueCols = oldSnap.columns.filter(_ != keyCol).toSeq
    // backtick-quote resolution paths: a value column named "price.usd"
    // would otherwise parse as field `usd` of column `price`
    def oc(c: String) = col(s"o.`$c`")
    def nc(c: String) = col(s"n.`$c`")
    val o = oldSnap.filter(col(keyCol).isNotNull).as("o")
    val n = newSnap.filter(col(keyCol).isNotNull).as("n")
    val joined = o.join(n, oc(keyCol) === nc(keyCol), "full_outer")

    val inOld = oc(keyCol).isNotNull
    val inNew = nc(keyCol).isNotNull
    // foldLeft, not reduce: a key-only table (presence set) has NO value
    // columns and reduce throws on the empty list — NEW/DELETED still
    // apply there, MODIFIED is simply never possible (lit(false))
    val changed = valueCols.map(c => !(oc(c) <=> nc(c)))
      .foldLeft(lit(false))(_ || _)

    val status = when(!inOld && inNew, New)
      .when(inOld && !inNew, Deleted)
      .when(inOld && inNew && changed, Modified)

    joined
      .withColumn("_status", status)
      .filter(col("_status").isNotNull)
      .select(
        Seq(coalesce(nc(keyCol), oc(keyCol)).as(keyCol), col("_status")) ++
          valueCols.map(c => nc(c).as(c)) ++
          valueCols.map(c => oc(c).as(s"old_$c")): _*)
  }
}
