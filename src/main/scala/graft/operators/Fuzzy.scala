package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy matching — edit-distance pairs without the cartesian
 * product, the standard record-linkage "blocking" design (Fellegi–Sunter
 * style candidate generation): rows only meet inside a block, and the
 * block key is part of the operator's contract, mirrored exactly by the
 * oracle.
 *
 * Scale shape (the same discipline as the LSH dedup family in
 * [[Dedup]]):
 *  1. DISTINCT the match column first — fuzzy matching is a VOCABULARY
 *     operation; at 100 TB the distinct-value table is orders of
 *     magnitude smaller than the row table, and matching rows instead of
 *     values recomputes the same Levenshtein pair millions of times.
 *  2. Equi-join on the block key — Levenshtein runs only on candidate
 *     pairs that share a block, a linear-size set when blocks are
 *     bounded, never the n² all-pairs set.
 *  3. `a < b` inside the block halves the work and makes the pair set
 *     canonical.
 * A block that is itself skew-hot (one block holding most values) is the
 * same failure mode as a hot LSH bucket — pick a finer block key, or
 * salt as in [[Dedup.embeddingNearDup]].
 */
object Fuzzy {

  /**
   * Canonical near-match pairs `(name_a, name_b, dist)` over the DISTINCT
   * values of `valueCol`, where both share `blockKey(value)` and
   * `levenshtein <= maxDist`. `blockKey` is a SQL-expressible Column
   * function so the oracle can mirror the blocking exactly. Values whose
   * block key evaluates to NULL never pair (equi-join semantics — the
   * same in the SQL mirror); a blockKey that can null out real values
   * (e.g. a regexp extract with no match) should coalesce to a sentinel
   * block if those values must still meet.
   */
  def pairs(df: DataFrame, valueCol: String,
            blockKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
            maxDist: Int): DataFrame = {
    val vocab = df.select(col(valueCol).as("v")).distinct()
      .withColumn("bk", blockKey(col("v")))
    val a = vocab.select(col("v").as("name_a"), col("bk"))
    val b = vocab.select(col("v").as("name_b"), col("bk"))
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    a.join(b, "bk")
      .filter(col("name_a") < col("name_b"))
      // bounded Levenshtein: the threshold form short-circuits the DP once
      // the running distance exceeds maxDist — O(len * maxDist) per pair
      // instead of O(len^2), the dominant cost of every in-block pair that
      // does NOT match (most of them). Returns -1 above the threshold and
      // the exact distance at or below it, so the kept rows are identical
      // to the unbounded form filtered by <= maxDist (the oracle's shape).
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist"))
  }
}
