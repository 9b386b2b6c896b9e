package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/**
 * Deterministic, engine-independent sampling for training-data pipelines:
 * membership is a pure function of the row KEY (md5-derived, the same
 * portable-hash discipline as the dedup pipelines), so
 *  - the split is reproducible across runs, engines, and cluster sizes
 *    (unlike `df.sample`, whose output depends on partition layout);
 *  - train/validation are complementary BY CONSTRUCTION (same predicate,
 *    negated) — no row lost or duplicated between them;
 *  - downstream joins of a sample against other tables stay pruned: the
 *    predicate pushes down like any scalar filter.
 */
object Sampling {

  /** Stable per-key bucket in [0, buckets). */
  def keyBucket(keyCol: String, buckets: Int = 100): org.apache.spark.sql.Column =
    pmod(TF.hash32(col(keyCol).cast("string")), lit(buckets))

  /** Keep keys whose bucket < `percent` (deterministic ~percent% sample). */
  def deterministicSample(df: DataFrame, keyCol: String, percent: Int,
                          buckets: Int = 100): DataFrame =
    df.filter(keyBucket(keyCol, buckets) < percent)

  /** Complementary (train, validation) split: validation = `valPercent`%,
    * train = the rest; union of the two == input, intersection == empty. */
  def trainValSplit(df: DataFrame, keyCol: String,
                    valPercent: Int): (DataFrame, DataFrame) = {
    val b = keyBucket(keyCol)
    (df.filter(b >= valPercent), df.filter(b < valPercent))
  }

  /** Per-group quota — the corpus-balancing cap ("at most n documents per
    * source/domain") applied deterministically: rank within the group by
    * (orderCol, keyCol) and keep the first n. One key shuffle; at scale the
    * window is the same hash-partition pass any grouped op pays. */
  def perGroupQuota(df: DataFrame, groupCol: String, orderCol: String,
                    keyCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol).asc, col(keyCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }
}
