package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Exact interpolated percentiles computed from a sorted-values array
 * instead of Spark's built-in `percentile` aggregate.
 *
 * Why this exists: the built-in exact `Percentile` is a
 * TypedImperativeAggregate whose buffer is an OpenHashMap of
 * value→count, paying a per-row hash insert plus a full buffer
 * serialization between partial and merge — on 150K mostly-distinct
 * doubles that alone costs ~0.4 s (A/B at sf0.1: 0.37 s vs 0.18 s for
 * `sort_array(collect_list(...))`, same values). A sorted collect_list
 * is an append-only array buffer with one sort at the end, and several
 * cut points can then be read off the SAME buffer for free.
 *
 * Memory shape is identical to the built-in exact percentile: both
 * buffer every value of the group. Exact percentiles are therefore a
 * group-fits-in-memory regime by construction — at 100 TB use
 * `approx_percentile` (a mergeable constant-memory sketch) and keep
 * this for oracle-exact paths and bounded groups.
 *
 * The interpolation reproduces Spark's `Percentile.getPercentile`
 * arithmetic operation-for-operation (floor/ceil on `p * (n-1)`, then
 * `lower*(higher-pos) + higher*(pos-lower)`), which is what the DuckDB
 * `quantile_cont` oracle agrees with on every suite fixture — pinned
 * bit-exact (no rounding) against the built-in by PercentilesSpec.
 */
object Percentiles {

  /** Aggregate expression: the sorted double array all cut points read
    * from. Nulls are skipped (collect_list semantics — same as the
    * built-in percentile); an empty group yields an empty array, which
    * [[fromSorted]] maps to null (same as the built-in). */
  def sortedVals(x: Column): Column = sort_array(collect_list(x.cast("double")))

  /** Exact interpolated percentile read off a [[sortedVals]] array. */
  def fromSorted(arr: Column, p: Double): Column = {
    require(p >= 0.0 && p <= 1.0, s"percentile must be in [0,1], got $p")
    val n = size(arr)
    // Spark computes position as Double, splits it with floor/ceil into
    // Longs, and interpolates with the two products below — reproduced
    // exactly so results are bit-identical to the built-in aggregate.
    val pos = lit(p) * (n - 1).cast("double")
    val lower = floor(pos) // LongType
    val higher = ceil(pos)
    val lowerVal = element_at(arr, (lower + 1).cast("int"))
    val higherVal = element_at(arr, (higher + 1).cast("int"))
    when(n === 0, lit(null).cast("double"))
      .when(lower === higher, lowerVal)
      .otherwise(lowerVal * (higher.cast("double") - pos) +
        higherVal * (pos - lower.cast("double")))
  }
}
