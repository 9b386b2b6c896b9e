package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted fact-to-dimension equi-join for pathologically skewed join keys —
 * the join-side sibling of [[SkewAgg]], for when the dimension is too big
 * to broadcast AND one fact key dominates (the "every third event is the
 * null user" shape). AQE's skew-join split handles moderate skew by
 * splitting oversized partitions; salting is the structural fix when a
 * SINGLE key exceeds what any one task should hold: the hot key's rows
 * spread over `saltBuckets` reducers BY CONSTRUCTION.
 *
 * Mechanics: facts get a deterministic content-hash salt ([[SkewAgg
 * .rowSalt]] — stable across runs and task retries); the dimension
 * replicates each row `saltBuckets` ways; the join key becomes
 * (key, salt). Output rows are exactly the plain join's (pinned by the
 * q_skew_join oracle, which IS the plain join) — salting only re-blocks
 * the work. Cost: a `saltBuckets`× dimension inflation, which is why this
 * is a targeted tool for hot-key joins, not a default.
 */
object SkewJoin {

  /** Inner equi-join of `facts` to `dim` on `factKey = dimKey`, salted
    * `saltBuckets` ways. Column set of the result = facts ++ dim columns
    * (both key columns kept, as with a plain join condition). */
  def saltedInner(facts: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String,
                  saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(!facts.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not contain the reserved internal column _salt")
    val fs = facts.withColumn("_salt", SkewAgg.rowSalt(facts, saltBuckets))
    val ds = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    fs.join(ds, fs(factKey) === ds(dimKey) && fs("_salt") === ds("_salt"),
        "inner")
      .drop(fs("_salt")).drop(ds("_salt"))
  }
}
