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
    // reserved-output guard (the patchExpired discipline): an existing
    // ord_key/shard — e.g. re-exporting a dataset writeShards itself
    // produced, which persists both — would be silently clobbered
    val clash = df.columns.filter(c =>
      c.equalsIgnoreCase("ord_key") || c.equalsIgnoreCase("shard"))
    require(clash.isEmpty,
      s"input already carries ${clash.mkString("/")} — drop or rename " +
        "before sharding (writeShards persists these columns)")
    // NULL keys salt as the empty string, so they land in a deterministic
    // shard instead of a NULL shard (which partitionBy would write to the
    // Hive default partition, invisible to loaders iterating shard=0..N-1)
    val salted: Column = concat(lit(seed + "-"),
      coalesce(col(keyCol).cast("string"), lit("")))
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
    // duplicate keys share an ord_key, and NULL salts like the empty
    // string: ties would otherwise sort in shuffle-arrival order, which
    // varies with partition layout — breaking the byte-identical-rerun
    // contract for exactly re-run corpora. Tiebreak on every ORDERABLE
    // payload column (maps are not orderable; rows differing only in an
    // unorderable column remain tied, and identical rows tie harmlessly
    // — identical bytes either way).
    val sharded = withShard(df, keyCol, nShards, seed)
    val tiebreak = df.schema.fields
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
      .map(f => col(f.name)).toSeq
    sharded
      .repartition(col("shard"))           // one task per shard directory
      .sortWithinPartitions(
        (Seq(col("shard"), col("ord_key")) ++ tiebreak): _*)
      .write.mode("overwrite").partitionBy("shard").format(format).save(outPath)
  }

  /**
   * TOKEN-balanced shard assignment: shards of ~equal token MASS rather
   * than ~equal row count ([[withShard]]'s uniform hash balances rows —
   * training loaders consume tokens, and a shard of long documents
   * otherwise becomes the epoch's straggler). Keys hash into
   * `nShards · bucketsPerShard` fine buckets; bucket token masses
   * aggregate once; each bucket maps to `shard = cum_mass_before /
   * ceil(total / nShards)` (exact integer division, clamped to the last
   * shard) so shards are contiguous bucket ranges with mass balanced to
   * within one bucket's mass. Output: (key, tokens, shard).
   *
   * Determinism: the bucket hash is the portable md5-derived hash32 and
   * every quantity is exact int64 — no float appears anywhere, so the
   * assignment replays bit-identically on any engine.
   *
   * Scale shape: one map-side-combined (bucket → mass) aggregation of
   * `nShards · bucketsPerShard` rows; the prefix-sum window runs over
   * that BOUNDED frame (never the corpus); rows take their shard from a
   * broadcast of it. The corpus itself never shuffles here — the
   * subsequent [[writeShards]]-style repartition on the shard id is the
   * one corpus shuffle, same as the row-balanced path.
   */
  def tokenBalancedShards(df: DataFrame, textCol: String, keyCol: String,
                          nShards: Int,
                          bucketsPerShard: Int = 64): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(bucketsPerShard > 0, "bucketsPerShard must be positive")
    val nBuckets = nShards * bucketsPerShard
    // NULL keys bucket as the empty string (the withShard rule): a null
    // hash would be a null _bucket, and the assignment join below would
    // silently DROP those rows from the export
    val rows = df.select(col(keyCol),
      TF.tokenCount(col(textCol)).cast("long").as("tokens"),
      pmod(TF.hash32(coalesce(col(keyCol).cast("string"), lit(""))),
        lit(nBuckets)).cast("long").as("_bucket"))
    val byBucket = org.apache.spark.sql.expressions.Window
      .orderBy(col("_bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val assign = rows.groupBy(col("_bucket"))
      .agg(sum(col("tokens")).as("_bm"))
      .withColumn("_cumb", coalesce(sum(col("_bm")).over(byBucket), lit(0L)))
      .withColumn("_total", sum(col("_bm")).over(all))
      .withColumn("shard",
        least(lit(nShards - 1L),
          expr(s"_cumb DIV ((_total + ${nShards - 1}) DIV $nShards)")))
      .select(col("_bucket"), col("shard"))
    rows.join(broadcast(assign), Seq("_bucket"))
      .select(col(keyCol), col("tokens"), col("shard"))
  }

  /**
   * Per-shard integrity manifest of an exported corpus: `(shard, n_rows,
   * content_hash)` where the hash is the int64-wrapped SUM of each row's
   * xxhash64 over its canonical JSON — order-independent (sum commutes),
   * so any partition layout of the same rows produces the same manifest,
   * and any dropped / duplicated / altered row changes it. One pass, one
   * shard-key aggregation; the manifest is |shards| rows.
   *
   * Contract: a Spark-side transfer check (export → copy → re-read →
   * compare manifests). The canonical form is Spark's `to_json` of the
   * non-shard columns by NAME ORDER — stable across Spark runs and
   * partitionings, not asserted byte-stable across other engines.
   */
  def shardManifest(df: DataFrame, shardCol: String = "shard"): DataFrame = {
    val payload = df.columns.filterNot(_ == shardCol).sorted
    require(payload.nonEmpty, "manifest needs at least one payload column")
    // sum in DECIMAL(38) then mod 2^64: order-independent and
    // duplicate-sensitive like a wrapped int64 sum, but legal under ANSI
    // mode (a raw long sum overflows and THROWS after ~2^63/hash rows)
    val mod = lit(new java.math.BigDecimal("18446744073709551616"))
    val h = xxhash64(to_json(struct(payload.map(col).toIndexedSeq: _*)))
      .cast("decimal(38,0)")
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(h), mod).as("content_hash"))
  }

  /** Shards whose (count, hash) drifted between two manifests — empty ⇔
    * the transfer preserved every shard byte-for-row. Full outer, so a
    * shard missing entirely on either side also surfaces. */
  def manifestDiff(expected: DataFrame, actual: DataFrame): DataFrame =
    expected.alias("e")
      .join(actual.alias("a"), col("e.shard") === col("a.shard"), "full_outer")
      .filter(
        col("e.n_rows").isNull || col("a.n_rows").isNull ||
        col("e.n_rows") =!= col("a.n_rows") ||
        col("e.content_hash") =!= col("a.content_hash"))
      .select(coalesce(col("e.shard"), col("a.shard")).as("shard"),
        col("e.n_rows").as("expected_rows"), col("a.n_rows").as("actual_rows"),
        col("e.content_hash").as("expected_hash"),
        col("a.content_hash").as("actual_hash"))
}
