package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.functions.{TextFunctions => TF}

/**
 * Data Selection via Importance Resampling (DSIR) — the published recipe
 * (Xie et al., NeurIPS 2023) for picking pretraining documents that "look
 * like" a small high-quality target set: represent every document as a
 * hashed bag of word n-grams, fit two smoothed unigram-over-buckets models
 * (target vs raw pool), and weigh each document by its log importance
 * ratio Σ_f [ln p_target(bucket(f)) − ln p_raw(bucket(f))]. Selection is
 * then a top-n (or sampling) pass over the weights.
 *
 * Reference relevance: the reference engine curates corpora with hand
 * filters (reverse indexes + per-field predicates, e.g.
 * app/server/gateway/gateway.go's index scans); DSIR is the
 * distribution-matching generalization a training pipeline runs at corpus
 * scale, so it joins the §2.13 curation family (q_curation, q_mix_*).
 *
 * Cross-engine exactness discipline (same as TermStats.lmScore): every
 * per-bucket log ratio is integer-scaled — CAST(round(ln(...)·1e6) AS
 * BIGINT) — BEFORE any per-document sum, so accumulation is exact int64
 * arithmetic and join/accumulation order cannot perturb the result; only
 * the final per-document mean-free total divides back to a double.
 *
 * Scale shape (the reason this form survives 100 TB):
 *  - the two n-gram models are aggregations BOUNDED BY `buckets` rows
 *    regardless of corpus size — the only shuffles in the whole pipeline
 *    move ≤ `buckets` (bucket, count) pairs per side;
 *  - scoring is a MAP-ONLY pass: the ratio table collapses to a dense
 *    int64 LUT of `buckets` entries (the explicit driver-side contract —
 *    8 MB at the 2^20 cap), shipped once as a literal into a per-row fold
 *    that runs inside the scan stage. The corpus text never shuffles and
 *    never joins; a 1000-executor scan scores embarrassingly parallel.
 *  - resampling is a TakeOrdered top-n on (weight, key) — per-partition
 *    heaps, driver merges n rows, no global sort.
 */
object Importance {

  /** Hashed feature-bucket array for one document: word unigrams + bigrams,
    * each mapped to `hash32(feature) % buckets`. The token array is bound
    * to a real column before the bigram lambda (see TF.wordBigrams' doc —
    * inlining the split re-evaluates it per element). */
  def bucketArray(text: Column, buckets: Int): Column =
    // fused unigram+bigram slot expression (one md5 loop per row) — the
    // transform(concat(toks, wordBigrams(toks)), f => pmod(hash32(f), B))
    // Column chain it replaces ran interpreted lambdas building a 32-char
    // hex string + a BigInteger parse PER FEATURE (the nbFit TokenSlots
    // lesson applied to DSIR); bit-identity to that chain is
    // property-pinned in CurationMlSpec
    graft.functions.TokenSlotFunctions
      .dsirFeatureSlots(TF.tokens(text), buckets)

  /** Per-bucket feature-occurrence counts for a corpus: ≤ `buckets` rows of
    * (bucket, cnt). The ONLY shuffle is the bounded (bucket, partial-count)
    * exchange — map-side partial aggregation has already collapsed each
    * scan task's output to ≤ `buckets` rows before it moves. */
  def bucketCounts(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    docs
      .select(explode(bucketArray(col(textCol), buckets)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /**
   * The DSIR model: per-bucket integer-scaled log importance ratios
   *   lr(b) = round(1e6 · [ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))])
   * with add-one smoothing over the B-bucket vocabulary (T, R = total
   * feature occurrences in target / raw). Output: (bucket, lr, t_total,
   * r_total), ≤ B rows — the totals ride along (constant per row, two
   * int64s) so a consumer can evaluate the smoothed formula at t=r=0 for
   * buckets ABSENT from the table: [[dsirScore]] uses them for its OOV
   * floor, and a model round-tripped through parquet keeps them.
   *
   * The two 1-row total frames broadcast onto the bucket table (the
   * TermStats.lmScore shape — a bounded BroadcastNestedLoopJoin by
   * construction, B rows × 1 row).
   */
  def dsirLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
                    buckets: Int): DataFrame = {
    val tc = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("cnt", "_tc")
    val rc = bucketCounts(raw, textCol, buckets)
      .withColumnRenamed("cnt", "_rc")
    val tTot = tc.agg(coalesce(sum(col("_tc")), lit(0L)).as("_T"))
    val rTot = rc.agg(coalesce(sum(col("_rc")), lit(0L)).as("_R"))
    tc.join(rc, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("bucket"),
        round((log((coalesce(col("_tc"), lit(0L)) + lit(1.0)) /
                   (col("_T") + lit(buckets).cast("double"))) -
               log((coalesce(col("_rc"), lit(0L)) + lit(1.0)) /
                   (col("_R") + lit(buckets).cast("double")))) * lit(1e6))
          .cast("long").as("lr"),
        col("_T").as("t_total"), col("_R").as("r_total"))
  }

  /**
   * [[dsirLogRatios]] for the COMMON DSIR setup where the target corpus is
   * a predicate over the raw pool (target = docs.filter(targetCond),
   * raw = docs) — the two bucket-count aggregations fuse into ONE corpus
   * scan and ONE shuffle: per bucket, `_tc` counts only target rows and
   * `_rc` counts all rows, and the two totals are exact integer window
   * sums of the ≤ `buckets`-row frame instead of two 1-row broadcast
   * cross-joins (r17, guide §2.4 — the q_psi_drift marginals-from-the-
   * fine-grained-agg discipline). Output rows and values are IDENTICAL to
   * `dsirLogRatios(docs.filter(targetCond), docs, ...)` (unit-pinned):
   * target ⊆ raw means the full-outer join's bucket set is exactly the
   * raw bucket set, and a 0 target count feeds the same (+1) smoothing as
   * the join's NULL did.
   */
  def dsirLogRatiosTagged(docs: DataFrame, targetCond: Column,
                          textCol: String, buckets: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    docs
      .select(targetCond.as("_t"), explode(bucketArray(col(textCol), buckets)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("_t"), 1L).otherwise(0L)).as("_tc"),
        count(lit(1)).as("_rc"))
      .withColumn("_T", sum(col("_tc")).over(W.partitionBy()))
      .withColumn("_R", sum(col("_rc")).over(W.partitionBy()))
      .select(col("bucket"),
        round((log((col("_tc") + lit(1.0)) /
                   (col("_T") + lit(buckets).cast("double"))) -
               log((col("_rc") + lit(1.0)) /
                   (col("_R") + lit(buckets).cast("double")))) * lit(1e6))
          .cast("long").as("lr"),
        col("_T").as("t_total"), col("_R").as("r_total"))
  }

  /** Hard cap on the dense LUT the scoring pass collects: 2^20 buckets =
    * 8 MB of int64 — comfortably a task-literal broadcast. */
  val MaxLutBuckets = 1 << 20

  /** Collect a bounded (bucket, value) model into a dense driver-side
    * int64 LUT, absent buckets pre-filled with `default` — the shared
    * kernel behind [[dsirScore]] and [[Classify.nbScore]]'s scan-stage
    * scoring. The collect is the documented bounded contract (`buckets` ≤
    * [[MaxLutBuckets]] enforced = 8 MB), the same class as the PQ
    * codebook / minhash-seed collects. */
  private[graft] def denseLut(model: DataFrame, bucketCol: String,
                              valueCol: String, buckets: Int,
                              default: Long): Array[Long] = {
    require(buckets > 0 && buckets <= MaxLutBuckets,
      s"buckets=$buckets outside (0, $MaxLutBuckets] — the dense-LUT " +
        "scoring contract; shard the model or raise MaxLutBuckets " +
        "deliberately")
    val lut = Array.fill(buckets)(default)
    model.select(col(bucketCol), col(valueCol)).collect().foreach { r =>
      val b = r.getLong(0).toInt
      if (b >= 0 && b < buckets) lut(b) = r.getLong(1)
    }
    lut
  }

  /** Shuffle-free integer fold: Σ_i lut[arr_i] as ONE scan-stage
    * expression over the literal dense LUT — the map-only scoring kernel.
    * `arr` values must be in [0, lut.length). */
  private[graft] def lutFold(arr: Column, lut: Array[Long]): Column = {
    val lutCol = typedlit(lut.toSeq)
    aggregate(arr, lit(0L),
      (acc, b) => acc + element_at(lutCol, (b + lit(1L)).cast(IntegerType)))
  }

  /**
   * Score every document: weight = Σ_f lr(bucket(f)) / 1e6, one row per
   * input key. `ratios` (≤ `buckets` rows — the output of
   * [[dsirLogRatios]]) is collected to a dense driver-side LUT
   * ([[denseLut]]'s bounded contract); buckets ABSENT from the table get
   * the fully-smoothed ratio evaluated at t=r=0 —
   * round(1e6·ln((R+B)/(T+B))) from the model's own `t_total`/`r_total`
   * columns — so scoring a document whose features never occurred in
   * either corpus is defined and consistent with [[Classify.nbScore]]'s
   * OOV floor (absence is unreachable when raw ⊇ scored docs, the usual
   * DSIR setup). A legacy (bucket, lr)-only model without the totals
   * falls back to a neutral 0 for absent buckets.
   *
   * The scoring pass itself is shuffle-free: a per-row integer fold over
   * the bucket array against the literal LUT, evaluated inside the scan
   * stage. At 100 TB this is the difference between "one more map pass"
   * and "explode every n-gram of the corpus into a join".
   */
  def dsirScore(docs: DataFrame, textCol: String, keyCol: String,
                ratios: DataFrame, buckets: Int,
                weightCol: String = "weight"): DataFrame = {
    require(buckets > 0 && buckets <= MaxLutBuckets,
      s"buckets=$buckets outside (0, $MaxLutBuckets] — the dense-LUT " +
        "scoring contract; shard the model or raise MaxLutBuckets " +
        "deliberately")
    // ONE bounded collect serves both the LUT and the OOV floor (the
    // totals are constant per row, so any row carries them) — a separate
    // totals action would run the two model aggregations a second time
    // (measured +0.7 s per query at sf0.1 when this was two collects).
    // An EMPTY model (two empty corpora) has no rows — every bucket is
    // then absent and the neutral-0 default applies vacuously.
    val hasTotals = ratios.columns.contains("t_total") &&
      ratios.columns.contains("r_total")
    val cols =
      if (hasTotals) Seq(col("bucket"), col("lr"), col("t_total"), col("r_total"))
      else Seq(col("bucket"), col("lr"))
    val rows = ratios.select(cols: _*).collect()
    // Classify.roundScaled, NOT math.round: one HALF_UP rounding rule
    // across every driver-side 1e6 scaling in the engine — math.round's
    // half-toward-+infinity disagrees with Spark/DuckDB on negative
    // exact-.5 boundaries, which would shift every OOV bucket's score
    // by 1e-6 against the relational oracle replay
    val floor: Long =
      if (hasTotals) rows.headOption.map { r =>
        Classify.roundScaled(
          math.log(1.0 / (r.getLong(2) + buckets.toDouble)) -
          math.log(1.0 / (r.getLong(3) + buckets.toDouble)))
      }.getOrElse(0L)
      else 0L
    val lut = Array.fill(buckets)(floor)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      if (b >= 0 && b < buckets) lut(b) = r.getLong(1)
    }
    // fused fold straight from the token array — no intermediate slots
    // array, no interpreted aggregate over a buckets-sized array literal
    docs.select(col(keyCol),
      round(graft.functions.TokenSlotFunctions
        .dsirFeatureFold(TF.tokens(col(textCol)), lut)
        .cast("double") / lit(1e6), 6).as(weightCol))
  }

  /** Importance selection: keep the `n` highest-weight documents, ties
    * broken by key for a total order. Catalyst plans this as TakeOrdered —
    * per-partition top-n heaps merged on the driver, never a global sort. */
  def dsirSelect(scored: DataFrame, keyCol: String, weightCol: String,
                 n: Int): DataFrame =
    scored.orderBy(col(weightCol).desc, col(keyCol).asc).limit(n)
}
