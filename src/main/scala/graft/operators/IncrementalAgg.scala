package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental view maintenance for algebraic aggregates: keep a
 * materialized per-group (count, sum) rollup current under a change
 * batch WITHOUT re-reading the base table — the mechanism that turns the
 * engine's CDC feed ([[graft.streaming.ChangeFeed]] /
 * SubscribeToEvents, proto/hydraide.proto:755-801) into continuously
 * maintained aggregates.
 *
 * Contract: `inserted` holds every row ADDED to the base (new rows +
 * post-image of modifications), `removed` every row that left it
 * (deleted rows + pre-image of modifications). A modification is thus an
 * insert + a remove, which also handles rows MOVING between groups.
 *
 * Scale shape: contributions aggregate map-side to one row per TOUCHED
 * group; the full-outer join against the previous rollup is
 * rollup-sized, not base-sized — a 100 TB base with a million-row change
 * batch costs the batch plus the rollup, never the base. Groups whose
 * count reaches zero drop from the output (matching a recompute, which
 * never sees them). Works for any algebraic aggregate; count + sum here
 * (avg = sum/count downstream); non-algebraic aggregates (exact
 * distinct, medians) need sketches ([[graft.SparkEntry]] q_sketch_union)
 * or a recompute.
 */
object IncrementalAgg {

  // ==========================================================================
  // Non-algebraic aggregates maintain a SKETCH, not (count, sum): deletes
  // can't subtract from a top-k/distinct state, but accumulation is still
  // incremental — each batch folds in WITHOUT re-reading prior data.
  // ==========================================================================

  /** One batch of values folded to a top-k sketch (1 row, binary).
    * The column name is backtick-quoted so spaced/hyphenated names
    * resolve as columns, not as parse errors or struct paths. */
  def topkAccumulate(batch: DataFrame, valueCol: String,
                     maxTracked: Int = 10000): DataFrame =
    batch.agg(expr(s"approx_top_k_accumulate(`$valueCol`, $maxTracked)")
      .as("sketch"))

  /** Merge sketch states (the previous state + any number of batch
    * sketches) into one — associative, so partial states from different
    * days/partitions/machines combine in any order. `maxTracked` is
    * passed to the combiner EXPLICITLY: the parameterless combine
    * requires every input sketch to share one tracking size and throws
    * on a mismatch, which would make states accumulated with different
    * budgets permanently uncombinable. */
  def topkCombine(states: Seq[DataFrame], maxTracked: Int = 10000): DataFrame = {
    require(states.nonEmpty, "topkCombine needs at least one sketch state")
    states.reduce(_.unionByName(_))
      .agg(expr(s"approx_top_k_combine(sketch, $maxTracked)").as("sketch"))
  }

  /** Read the current top-k estimate off a sketch state. */
  def topkEstimate(state: DataFrame, k: Int): DataFrame =
    state.select(explode(expr(s"approx_top_k_estimate(sketch, $k)")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("cnt"))

  /** A (count, sum, non-null-value count) rollup of `df` by `groupCol` —
    * the shape [[applyChanges]] maintains. `cnt_v` exists for NULL
    * exactness: SQL `sum` is NULL (not 0) over a group with zero non-null
    * values, and after deletes the maintained sum cannot distinguish
    * "cancelled to 0" from "no values left" without it. */
  def rollup(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_v"),
        count(col(valueCol)).as("cnt_v"))

  /** `prev` (a [[rollup]] output) advanced by one change batch. The
    * delta sums use the SAME `sum(valueCol)` widening as [[rollup]] —
    * no cast to double — so the maintained view keeps the recompute's
    * exact type and precision (a LongType revenue column stays exact
    * past 2^53, where a double-typed delta would silently round). */
  def applyChanges(prev: DataFrame, inserted: DataFrame, removed: DataFrame,
                   groupCol: String, valueCol: String): DataFrame = {
    val adds = inserted.select(col(groupCol),
      lit(1L).as("_dc"), col(valueCol).as("_dv"),
      when(col(valueCol).isNotNull, 1L).otherwise(0L).as("_dcv"))
    val drops = removed.select(col(groupCol),
      lit(-1L).as("_dc"), (-col(valueCol)).as("_dv"),
      when(col(valueCol).isNotNull, -1L).otherwise(0L).as("_dcv"))
    val delta = adds.unionByName(drops)
      .groupBy(col(groupCol))
      .agg(sum(col("_dc")).as("_dcnt"), sum(col("_dv")).as("_dsum"),
        sum(col("_dcv")).as("_dcntv"))
    val sumType = prev.schema("sum_v").dataType
    val sumZero = lit(0).cast(sumType)
    // null-safe equi-join (<=>): groupBy treats NULL as one real group, so
    // the maintenance join must too — a plain USING join never equi-matches
    // NULL keys and would split the NULL group into two output rows (one
    // carrying prev state, one the delta), diverging from a recompute
    val cntV = (coalesce(col("cnt_v"), lit(0L)) +
      coalesce(col("_dcntv"), lit(0L)))
    prev.withColumnRenamed(groupCol, "_pg")
      .join(delta.withColumnRenamed(groupCol, "_dg"),
        col("_pg") <=> col("_dg"), "full_outer")
      .select(coalesce(col("_pg"), col("_dg")).as(groupCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dcnt"), lit(0L))).as("cnt"),
        // cast the recombined sum BACK to prev's type: decimal addition
        // widens precision by one, and without the cast a maintained view
        // fed back through applyChanges would change schema every batch —
        // breaking any fixed-schema sink holding it. NULL exactness: SQL
        // sum over zero non-null values is NULL, not 0 — a group whose
        // last non-null value was deleted must report NULL like the
        // recompute, which the cancelled-to-zero sum alone cannot know
        when(cntV === 0, lit(null).cast(sumType))
          .otherwise((coalesce(col("sum_v"), sumZero) +
            coalesce(col("_dsum"), sumZero)).cast(sumType)).as("sum_v"),
        cntV.as("cnt_v"))
      .filter(col("cnt") > 0)
  }
}
