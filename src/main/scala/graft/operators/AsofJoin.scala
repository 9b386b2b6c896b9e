package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * As-of join — for each left row, attach the single right row with the
 * greatest right time <= the left row's time within the same key (the
 * temporal lookup every event pipeline needs: "the dimension state this
 * event saw"). Spark has no native ASOF operator; the naive range join
 * (l.key = r.key AND r.t <= l.t, then max) explodes to every earlier
 * right row per left row — quadratic per key.
 *
 * This is the scalable UNION-WINDOW formulation instead: tag both inputs,
 * union them, sort per key by (time, side) with right rows first at equal
 * times (so `>=` includes equality), and carry the last non-null right
 * values forward with an IGNORE NULLS window. One hash shuffle + sort on
 * the key — the same cost as any grouped window, no row explosion, no
 * driver-side state. Left rows with no earlier right row keep NULLs
 * (left-outer semantics, matching SQL `ASOF LEFT JOIN`).
 *
 * Requirements (documented, not silently repaired): right must be unique
 * per (keys, rightTime) — pre-aggregate if not, or the carried values are
 * order-dependent among ties; left/right non-key value column names must
 * be disjoint.
 */
object AsofJoin {

  /** `forward = false` (default): greatest right time <= left time — "the
    * state this event saw". `forward = true`: smallest right time >= left
    * time — "the next state after this event" (label lookahead, next-fix
    * attribution). Symmetric formulation: the union walk runs in reverse
    * time order and carries the nearest LATER right row back; equality is
    * included in both directions. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               forward: Boolean = false): DataFrame = {
    val rightVals = right.columns.filterNot(c =>
      keyCols.contains(c) || c == rightTimeCol).toSeq
    val leftCols = left.columns.filterNot(keyCols.contains).toSeq
    val clash = leftCols.intersect(rightVals)
    require(clash.isEmpty, s"left/right value columns must be disjoint: $clash")
    val reserved = Seq("_asof_t", "_asof_isL")
    val reservedHit = (left.columns ++ right.columns).toSeq.intersect(reserved)
    require(reservedHit.isEmpty,
      s"inputs must not contain reserved internal columns: ${reservedHit.distinct}")

    val lTagged = left.select(
      keyCols.map(col) ++
        Seq(col(leftTimeCol).as("_asof_t"), lit(1).as("_asof_isL")) ++
        leftCols.map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right.select(
      keyCols.map(col) ++
        Seq(col(rightTimeCol).as("_asof_t"), lit(0).as("_asof_isL")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)

    // right (0) sorts before left (1) at the same timestamp => equality
    // is included, exactly SQL ASOF's `l.t >= r.t` (or `<=` forward —
    // the walk simply runs in reverse time order)
    val timeOrd = if (forward) col("_asof_t").desc else col("_asof_t").asc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrd, col("_asof_isL").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)

    rightVals.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .filter(col("_asof_isL") === 1)
      .select(keyCols.map(col) ++ leftCols.map(col) ++ rightVals.map(col): _*)
  }
}
