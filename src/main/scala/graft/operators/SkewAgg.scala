package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Two-stage salted aggregation for pathologically skewed keys — the manual
 * fallback when AQE's skew handling can't help (AQE splits skewed JOIN
 * partitions, but a hash aggregation with one hot key still funnels that
 * key's every row through a single reducer).
 *
 * Stage 1 shuffles on (key, salt) — the hot key spreads over `saltBuckets`
 * reducers, each computing a partial aggregate; stage 2 shuffles only the
 * tiny per-(key, salt) partials on the key. Works for any algebraic
 * aggregate (sum/count/min/max and compositions); non-algebraic aggregates
 * (exact distinct, medians) need their own decomposition.
 *
 * The reference sidesteps skew structurally — one swamp per key pattern
 * (docs/how-hydraide-works.md "deterministic naming") — which is exactly
 * what salting reconstructs inside a shuffle.
 */
object SkewAgg {

  /** The deterministic row salt [[saltedSum]]/[[saltedCount]] use — a pure
    * hash of every HASHABLE input column (MapType columns are skipped:
    * Spark's hash() rejects maps, and a map column must not break a
    * previously-working salted aggregation). Exposed so its spreading
    * behavior is directly testable. */
  def rowSalt(df: DataFrame, saltBuckets: Int): Column = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(et, _) => hashable(et)
      case st: StructType => st.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(cols.nonEmpty, "rowSalt needs at least one hashable column")
    pmod(hash(cols.toIndexedSeq: _*), lit(saltBuckets))
  }

  /** Per-key sums of `valueCols` with salt-spread partials. The salt is a
    * pure hash of every (hashable) input column — fully deterministic
    * across runs AND task retries, so the partial-sum grouping (and with
    * it any last-ulp float accumulation order) is stable; the earlier
    * `monotonically_increasing_id` salt changed on retry. Hashing all
    * columns (not just key + aggregated values) matters: a salt of
    * (key, value) alone collapses whenever the value is low-cardinality —
    * for [[saltedCount]]'s constant 1 it put EVERY row of a hot key in one
    * bucket, which is no salting at all. Rows identical across the full
    * row still collapse (content hashing can't split them) — there, dedup
    * or a pre-aggregated (row, multiplicity) form is the tool. */
  def saltedSum(df: DataFrame, keyCol: String, valueCols: Seq[String],
                saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = df.withColumn("_salt", rowSalt(df, saltBuckets))
    val partial = salted.groupBy(col(keyCol), col("_salt"))
      .agg(valueCols.head -> "sum", valueCols.tail.map(_ -> "sum"): _*)
      .toDF(Seq(keyCol, "_salt") ++ valueCols.map(c => s"_p_$c"): _*)
    partial.groupBy(col(keyCol))
      .agg(sum(s"_p_${valueCols.head}").as(valueCols.head),
        valueCols.tail.map(c => sum(s"_p_$c").as(c)): _*)
  }

  /** Per-key counts with salt-spread partials.
    *
    * LIMITATION (loud, not a footnote): the salt is a content hash, so rows
    * that are fully IDENTICAL — the hot key with a constant payload, i.e.
    * the common counter/event workload — all land in ONE salt bucket and
    * this silently degrades to an unsalted aggregation. For that shape use
    * [[saltedCountPreAgg]], which collapses identical rows map-side before
    * salting. */
  def saltedCount(df: DataFrame, keyCol: String,
                  saltBuckets: Int = 16): DataFrame =
    df.withColumn("_one", lit(1L))
      .transform(d => saltedSum(d, keyCol, Seq("_one"), saltBuckets))
      .withColumnRenamed("_one", "cnt")

  /** Per-key counts for workloads where a hot key's rows may be fully
    * identical (constant-payload counters) — the one shape content-hash
    * salting cannot spread. Stage 0 groups by the FULL row: identical rows
    * collapse map-side (partial aggregation emits one (row, multiplicity)
    * per task), so the shuffle carries at most tasks × distinct-rows
    * partials instead of every raw row; the now-distinct partials then
    * flow through [[saltedSum]] on the multiplicity. */
  def saltedCountPreAgg(df: DataFrame, keyCol: String,
                        saltBuckets: Int = 16): DataFrame = {
    val pre = df.groupBy(df.columns.toIndexedSeq.map(col): _*)
      .agg(count(lit(1)).as("_mult"))
    saltedSum(pre, keyCol, Seq("_mult"), saltBuckets)
      .withColumnRenamed("_mult", "cnt")
  }

  /** Generic two-stage form: caller supplies the partial aggregates
    * (run per (key, salt)) and the merge aggregates (run per key over the
    * partial columns). */
  def salted(df: DataFrame, keyCol: String,
             partialAggs: Seq[Column], mergeAggs: Seq[Column],
             saltCol: Column): DataFrame =
    df.withColumn("_salt", saltCol)
      .groupBy(col(keyCol), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(keyCol))
      .agg(mergeAggs.head, mergeAggs.tail: _*)
}
