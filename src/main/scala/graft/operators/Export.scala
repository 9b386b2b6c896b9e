package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/**
 * Training-shard export — the terminal step of a curation pipeline: emit
 * the corpus as N shards whose ASSIGNMENT and ORDER are pure functions of
 * the row key, so a re-run (any engine, any cluster size, any partition
 * layout) produces byte-identical shards. `df.write` alone cannot promise
 * that: file boundaries follow partition layout, and `orderBy(rand())`
 * isn't reproducible.
 *
 * Scale shape: one shuffle on the shard id (each shard directory written
 * by exactly one task — the same small-files guard as
 * [[FanOut.writeTagPartitions]]), plus a per-shard in-memory sort on the
 * md5 order key. Shard sizes are balanced in expectation (uniform hash);
 * there is no global sort and no driver-side pass. At 100 TB, `nShards`
 * is chosen so a shard fits one task's write budget (~1–4 GB), exactly
 * how production corpus exports size their output.
 */
object Export {

  /** Deterministic shard id + intra-shard order key for `keyCol`:
    * `shard = hash32(seed‖key) mod n`, `ord_key = md5(seed‖key)`. Both are
    * engine-portable (md5-derived, the repo-wide discipline). */
  def withShard(df: DataFrame, keyCol: String, nShards: Int,
                seed: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val salted: Column = concat(lit(seed + "-"), col(keyCol).cast("string"))
    df.withColumn("ord_key", md5(salted))
      .withColumn("shard", pmod(TF.hash32(salted), lit(nShards)).cast("int"))
  }

  /**
   * Write `df` as `nShards` deterministic shards under `outPath/shard=K/`,
   * rows inside each shard ordered by the portable order key. `format` is
   * "parquet" or "json" (JSONL — one object per line, the common
   * training-loader input).
   */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int, outPath: String,
                  seed: String, format: String = "parquet"): Unit = {
    require(format == "parquet" || format == "json", s"unsupported format $format")
    withShard(df, keyCol, nShards, seed)
      .repartition(col("shard"))           // one task per shard directory
      .sortWithinPartitions(col("shard"), col("ord_key"))
      .write.mode("overwrite").partitionBy("shard").format(format).save(outPath)
  }
}
