package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join without a cross product. Spark plans a
 * bare `p.ts >= i.start AND p.ts < i.end` join as BroadcastNestedLoop (or
 * worse, a cartesian product) — every point against every interval,
 * O(|P|·|I|), which melts at corpus scale.
 *
 * The binned formulation makes it an EQUI-join: time is cut into
 * fixed-width bins, each interval explodes into the bins it overlaps,
 * each point maps to exactly one bin, the two sides hash-join on the bin
 * id, and an exact containment filter removes same-bin false candidates.
 * Candidate pairs are then |P| x (avg intervals overlapping a point's
 * bin) instead of |P| x |I| — linear for the calendar-shaped interval
 * sets (maintenance windows, sessions, campaigns) this exists for.
 *
 * `binWidth` tuning: pick it near the TYPICAL interval length. Each
 * interval emits ceil(len/W)+1 bin rows — a W far below interval length
 * multiplies the exploded side; a W far above it piles unrelated
 * intervals into each bin (more false candidates for the exact filter).
 * Both degrade gracefully, nothing explodes quadratically. Skewed LONG
 * intervals (one interval spanning the whole corpus) emit len/W rows —
 * bounded and visible in the plan, unlike a nested-loop blowup.
 *
 * Interval semantics are half-open `[start, end)`; `end <= start` yields
 * no matches (empty interval). NULL bounds or point times never match.
 */
object RangeJoin {

  /** All (point, interval) pairs with pointTs in [startCol, endCol).
    * Output carries every point column plus every interval column
    * (names must be disjoint). Bin width is a Scala duration string
    * parsed by Spark's INTERVAL syntax, e.g. "2 hours". */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startCol: String, endCol: String,
                      binWidth: String): DataFrame = {
    val clash = points.columns.toSeq.intersect(intervals.columns.toSeq)
    require(clash.isEmpty, s"point/interval column names must be disjoint: $clash")
    val reserved = "_rj_bin"
    require(!(points.columns ++ intervals.columns).contains(reserved),
      s"inputs must not contain the reserved column $reserved")

    // bin id = floor(epoch-micros / width-micros); computed identically on
    // both sides so containment implies bin membership. The interval
    // covers bins bin(start) .. bin(end - 1 microsecond) — half-open end.
    def binOf(ts: Column, w: Long): Column = floor(unix_micros(ts) / lit(w))

    val w = java.time.Duration.parse(toIso(binWidth)).toNanos / 1000L
    require(w > 0, s"binWidth must be positive: $binWidth")

    val binnedIntervals = intervals
      .filter(col(endCol) > col(startCol)) // empty/invalid intervals match nothing
      .withColumn(reserved, explode(sequence(
        binOf(col(startCol), w),
        binOf(col(endCol) - expr("INTERVAL 1 MICROSECOND"), w))))
    val binnedPoints = points.withColumn(reserved, binOf(col(pointTs), w))

    binnedPoints.join(binnedIntervals, Seq(reserved))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop(reserved)
  }

  /** All (left, right) interval pairs that OVERLAP (half-open:
    * lStart < rEnd AND rStart < lEnd), binned like [[pointInInterval]].
    * Both sides explode into covered bins; a pair sharing several bins
    * would surface once per shared bin, so candidates are kept only in
    * the FIRST shared bin (bin == max(bin(lStart), bin(rStart))) — exact
    * dedup with no distinct() shuffle. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      binWidth: String): DataFrame = {
    val clash = left.columns.toSeq.intersect(right.columns.toSeq)
    require(clash.isEmpty, s"left/right column names must be disjoint: $clash")
    val reserved = "_rj_bin"
    require(!(left.columns ++ right.columns).contains(reserved),
      s"inputs must not contain the reserved column $reserved")
    def binOf(ts: Column, w: Long): Column = floor(unix_micros(ts) / lit(w))
    val w = java.time.Duration.parse(toIso(binWidth)).toNanos / 1000L
    require(w > 0, s"binWidth must be positive: $binWidth")

    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) > col(s))
      .withColumn(reserved, explode(sequence(
        binOf(col(s), w), binOf(col(e) - expr("INTERVAL 1 MICROSECOND"), w))))

    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq(reserved))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col(reserved) === greatest(binOf(col(lStart), w), binOf(col(rStart), w)))
      .drop(reserved)
  }

  /** "2 hours" / "30 minutes" / "1 day" -> ISO-8601 duration for
    * java.time.Duration (driver-side width arithmetic only). */
  private def toIso(width: String): String = {
    val parts = width.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"binWidth must be '<n> <unit>': $width")
    val n = parts(0).toLong
    parts(1).stripSuffix("s") match {
      case "second" => s"PT${n}S"
      case "minute" => s"PT${n}M"
      case "hour" => s"PT${n}H"
      case "day" => s"P${n}D"
      case other => throw new IllegalArgumentException(s"unsupported unit: $other")
    }
  }
}
