package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.filters.{FilterCompiler, FilterNode}

/**
 * Atomic select+delete ("shift") and quota ("Cap") semantics.
 *
 * The reference shifts expired/matching treasures under the swamp lock so
 * concurrent callers get disjoint sets (reference: proto/hydraide.proto:
 * 1109-1263, 3435-3457; app/server/gateway/gateway.go:1038-1195,
 * gateway_shift_matching.go:25-243). In a batch engine the "atomicity" is
 * the job boundary: one job computes the claimed set and the survivor set
 * from the same snapshot; the claimed rows are the job output and the
 * survivor set is what gets written back. Concurrent disjointness is a
 * storage-transaction concern (Delta/Iceberg optimistic commit), documented
 * as such in SURVEY.md §7.4.
 *
 * KEY CONTRACT (the [[Snapshots.mergeCommit]] delta-key rule): `keyCol`
 * must be UNIQUE — it is the swamp's primary key in the reference, and
 * the survivor set is computed as an ANTI-JOIN on it, so a duplicate key
 * whose copies straddle the claim boundary would have its UNCLAIMED
 * copies silently removed from both outputs (neither claimed nor written
 * back). Tables flowing out of [[Snapshots]] commits hold this by
 * construction.
 */
object Shift {

  final case class ShiftResult(claimed: DataFrame, remaining: DataFrame)

  /**
   * Claim up to `howMany` expired rows, oldest expiry first (deterministic
   * tie-break on the key), and return both the claimed set and the survivor
   * set computed from the same snapshot. `ShiftExpiredTreasures` equivalent.
   */
  def shiftExpired(df: DataFrame, expiryCol: String, keyCol: String,
                   now: java.sql.Timestamp, howMany: Int): ShiftResult = {
    // null-key rows are UNADDRESSABLE (the Mutations.set discipline): a
    // claimed null key can never anti-join out of the survivor set, so it
    // would appear in BOTH claimed and remaining — double delivery. They
    // stay in `remaining` untouched instead of being claimable.
    // The claimed set is tracked (≤ howMany rows — trivially cacheable):
    // the caller reads it AND the anti-join reads it, and without the
    // pin the expensive filter+sort+limit would run once per consumer
    // (and any tie nondeterminism could make the two runs disagree).
    val expired = df.filter(col(expiryCol).isNotNull &&
      col(expiryCol) < lit(now) && col(keyCol).isNotNull)
    val claimed = graft.CacheRegistry.track(
      expired.orderBy(col(expiryCol).asc, col(keyCol).asc).limit(howMany))
    val remaining = df.join(claimed.select(keyCol), Seq(keyCol), "left_anti")
    ShiftResult(claimed, remaining)
  }

  /** `ShiftByKeys`: atomic get-and-delete of an explicit key list. RPC-sized
    * lists compile to pushed-down `isin` literals; past [[KeyProbe.InlineThreshold]]
    * the same call switches to a broadcast semi/anti join (the reference's
    * batched key loop, gateway.go:550-631, has no plan cliff to avoid — a
    * thousand-literal `In` on Spark does). */
  def shiftByKeys(df: DataFrame, keyCol: String, keys: Seq[Any]): ShiftResult =
    ShiftResult(KeyProbe.semi(df, keyCol, keys), KeyProbe.anti(df, keyCol, keys))

  /** `ShiftMatchingTreasures`: parametric filter + axis order + bound. */
  def shiftMatching(df: DataFrame, filter: FilterNode, orderCol: String,
                    ascending: Boolean, keyCol: String, howMany: Int): ShiftResult = {
    val ord = if (ascending) col(orderCol).asc else col(orderCol).desc
    // same null-key exclusion + claimed-set pin as shiftExpired
    val claimed = graft.CacheRegistry.track(
      df.filter(FilterCompiler.compile(filter, df) && col(keyCol).isNotNull)
        .orderBy(ord, col(keyCol).asc).limit(howMany))
    val remaining = df.join(claimed.select(keyCol), Seq(keyCol), "left_anti")
    ShiftResult(claimed, remaining)
  }

  /**
   * Cap quota (proto:1152-1173; docs/features/cap-quota.md): a write batch
   * is admitted only while `count(rows matching capFilter)` after the write
   * stays <= maxMatching. Returns the would-be result annotated with a
   * `_cap_reached` flag; the caller commits or rejects the whole batch —
   * same all-or-nothing contract as the reference's `CapReached`.
   */
  def capGate(post: DataFrame, capFilter: Column, maxMatching: Long): DataFrame = {
    // reserved-name guard (the AsofJoin discipline): an existing `_c`
    // makes the comparison ambiguous and the drop destructive; an
    // existing `_cap_reached` would be silently clobbered
    val hit = post.columns.toSeq.intersect(Seq("_c", "_cap_reached"))
    require(hit.isEmpty, s"input must not contain reserved columns: $hit")
    val capCount = post.filter(capFilter).select(count(lit(1)).as("_c"))
    post.crossJoin(broadcast(capCount))
      .withColumn("_cap_reached", col("_c") > lit(maxMatching))
      .drop("_c")
  }
}
