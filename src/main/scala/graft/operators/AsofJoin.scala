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
    val reserved = Seq("_asof_t", "_asof_isL", "_asof_rv")
    val reservedHit = (left.columns ++ right.columns).toSeq.intersect(reserved)
    require(reservedHit.isEmpty,
      s"inputs must not contain reserved internal columns: ${reservedHit.distinct}")

    // The right row is carried as ONE struct, not per-column: independent
    // per-column `last(_, ignoreNulls)` would resurrect a STALE value for
    // any column that is NULL in the matched right row — the output could
    // mix columns from different right rows, a row that never existed.
    // The struct is non-null whenever a right row was seen, so its NULL
    // fields stay NULL and all columns come from the same row.
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)))
    val lTagged = left.select(
      keyCols.map(col) ++
        Seq(col(leftTimeCol).as("_asof_t"), lit(1).as("_asof_isL")) ++
        leftCols.map(col) :+
        lit(null).cast(rvType).as("_asof_rv"): _*)
    // right rows with a NULL time OR a NULL key component can never
    // legitimately match (SQL ASOF comparisons and equi-keys with NULL
    // are no-matches) — drop them before the walk. Without the key
    // filter, Window.partitionBy would group NULL = NULL into one
    // partition and a NULL-key left row would pick up NULL-key right
    // values, a row SQL ASOF LEFT JOIN never produces; with it, NULL-key
    // left rows share a partition containing no right rows and keep
    // NULLs (the left-outer contract).
    val rTagged = right.filter(
      keyCols.map(col(_).isNotNull)
        .foldLeft(col(rightTimeCol).isNotNull)(_ && _)).select(
      keyCols.map(col) ++
        Seq(col(rightTimeCol).as("_asof_t"), lit(0).as("_asof_isL")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col): _*).as("_asof_rv"): _*)

    // right (0) sorts before left (1) at the same timestamp => equality
    // is included, exactly SQL ASOF's `l.t >= r.t` (or `<=` forward —
    // the walk simply runs in reverse time order). NULLS FIRST in BOTH
    // directions: a left row with NULL time must see NO right rows (no
    // match => NULL right values, the LEFT-outer contract) — desc's
    // default nulls-last placement would hand it every right row
    val timeOrd =
      if (forward) col("_asof_t").desc_nulls_first
      else col("_asof_t").asc_nulls_first
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrd, col("_asof_isL").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)

    lTagged.unionByName(rTagged)
      .withColumn("_asof_rv", last(col("_asof_rv"), ignoreNulls = true).over(w))
      .filter(col("_asof_isL") === 1)
      .select(keyCols.map(col) ++ leftCols.map(col) ++
        rightVals.map(c => col("_asof_rv").getField(c).as(c)): _*)
  }
}
