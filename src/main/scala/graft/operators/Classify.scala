package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TokenSlotFunctions => TS}

/**
 * Hashed bag-of-words linear text classifier — the fastText-shaped quality
 * gate (Joulin et al. 2016's model family) trained generatively as
 * multinomial Naive Bayes with the hashing trick (Weinberger et al. 2009):
 * tokens hash into `buckets` feature slots, training counts per-class slot
 * occurrences, and the model is one log-likelihood-ratio weight per slot
 * plus a class-prior bias. Scoring is the same linear form fastText serves:
 * score(doc) = bias + Σ_tok w[bucket(tok)], predict positive iff score > 0.
 *
 * This is the classifier-quality-filter stage of a pretraining pipeline
 * (e.g. "keep documents that look like the curated reference class") —
 * the learned counterpart of the hand-rule TF.qualityScore, and the same
 * §2.13 curation family as Importance (DSIR): DSIR matches a target
 * DISTRIBUTION, this separates two labeled CLASSES.
 *
 * Cross-engine exactness: per-slot weights are integer-scaled
 * (round(ln·1e6) AS BIGINT) before any per-document sum — identical
 * discipline to TermStats.lmScore, so a DuckDB oracle reproduces scores
 * bit-for-bit. Only the final display score divides back to double.
 *
 * Scale shape:
 *  - TRAINING is two aggregations bounded by `buckets` rows — the corpus
 *    contributes (bucket, partial count) pairs collapsed map-side; the
 *    label column rides the same scan (no join against a label table
 *    here; callers join labels in beforehand if separate).
 *  - the MODEL is ≤ `buckets` rows and broadcasts; the two 1-row
 *    total/floor frames broadcast the same way (the lmScore BNLJ shape,
 *    bounded by construction).
 *  - SCORING is a SHUFFLE-FREE scan-stage pass: the model collapses to a
 *    dense int64 LUT literal and every document folds its token slots
 *    against it in place ([[Importance.lutFold]] — the dsirScore
 *    machinery). Document text never moves; nothing shuffles at all.
 *    Past [[Importance.MaxLutBuckets]] the broadcast-join form
 *    ([[nbScoreJoin]]) takes over: one int64 pair per doc shuffles.
 */
/** The fused-fit model: the dense per-slot llr LUT (index = slot, absent
  * slots pre-filled with the OOV `floor`), the class-prior `bias`, and the
  * `floor` itself — everything [[Classify.nbScore]] needs, one small
  * driver-side value (≤ 8 MB by the MaxLutBuckets contract). */
final case class NbModel(lut: Array[Long], bias: Long, floor: Long)

object Classify {

  /** Token→slot mapping shared by train and score: portable 32-bit md5
    * hash mod `buckets` (hash32 is non-negative, so % == pmod). */
  private def slot(tok: Column, buckets: Int): Column =
    pmod(TF.hash32(tok), lit(buckets.toLong))

  private def slots(docs: DataFrame, textCol: String, keyCol: String,
                    buckets: Int): DataFrame =
    docs.select(col(keyCol),
      explode(TF.tokens(col(textCol))).as("_tok"))
      .select(col(keyCol), slot(col("_tok"), buckets).as("bucket"))

  /**
   * Train: per-slot integer-scaled log-likelihood ratios
   *   llr(b) = round(1e6 · [ln((p_b+1)/(P+B)) − ln((n_b+1)/(N+B))])
   * (add-one smoothing over the B-slot vocabulary; P/N = total token
   * occurrences in the positive/negative class). Output (bucket, llr),
   * ≤ B rows — the broadcastable model.
   *
   * `labelCol` must be a boolean column on `docs`.
   */
  def nbTrain(docs: DataFrame, textCol: String, labelCol: String,
              buckets: Int): DataFrame = {
    val toks = docs.select(col(labelCol).as("_y"),
      explode(TF.tokens(col(textCol))).as("_tok"))
      .select(col("_y"), slot(col("_tok"), buckets).as("bucket"))
    // one pass, both classes: conditional counts per slot
    val cnt = toks.groupBy(col("bucket")).agg(
      count(when(col("_y"), 1)).as("_p"),
      count(when(!col("_y"), 1)).as("_n"))
    val tot = cnt.agg(
      coalesce(sum(col("_p")), lit(0L)).as("_ptot"),
      coalesce(sum(col("_n")), lit(0L)).as("_ntot"))
    cnt.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round((log((col("_p") + lit(1.0)) / (col("_ptot") + lit(buckets).cast("double"))) -
               log((col("_n") + lit(1.0)) / (col("_ntot") + lit(buckets).cast("double")))) * lit(1e6))
          .cast("long").as("llr"))
  }

  /**
   * The two scalar model constants scoring needs besides the slot table,
   * computed in ONE bounded job over the training set:
   *  - bias  = round(1e6 · ln((docs⁺+1)/(docs⁻+1)))  (smoothed class prior)
   *  - floor = round(1e6 · [ln(1/(P+B)) − ln(1/(N+B))]) — the llr of a slot
   *    never seen in training (both counts zero), coalesced in at score
   *    time so out-of-vocabulary tokens are defined.
   * Driver-side single-row collect — bounded by construction (the same
   * contract class as the lmScore denominator collect).
   */
  def nbConstants(docs: DataFrame, textCol: String, labelCol: String,
                  buckets: Int): (Long, Long) = {
    // null-text guard, the Mutations.sliceSize discipline: under a
    // deployment that restores spark.sql.legacy.sizeOfNull, size(split(
    // NULL)) is -1 — each null-text doc would SUBTRACT one token from its
    // class total, skewing the OOV floor and breaking the pinned
    // nbFit == nbTrain+nbConstants equality (nbFit counts such docs as
    // zero-token via its coalesce-to-no-slots path)
    val tc = when(col(textCol).isNull, lit(0))
      .otherwise(TF.tokenCount(col(textCol)))
    val r = docs.select(
      count(when(col(labelCol), 1)).as("_pd"),
      count(when(!col(labelCol), 1)).as("_nd"),
      coalesce(sum(when(col(labelCol), tc)), lit(0L)).as("_P"),
      coalesce(sum(when(!col(labelCol), tc)), lit(0L)).as("_N"))
      .head()
    val (pd, nd, p, n) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // roundScaled, NOT math.round: one rounding rule across the fused and
    // unfused fits — math.round's half-toward-+infinity disagrees with
    // Spark/DuckDB HALF_UP on negative exact-.5 boundaries, which would
    // break the pinned nbFit == nbTrain+nbConstants equality on such data
    val bias = roundScaled(math.log((pd + 1.0) / (nd + 1.0)))
    val floor = roundScaled(math.log(1.0 / (p + buckets.toDouble)) -
      math.log(1.0 / (n + buckets.toDouble)))
    (bias, floor)
  }

  /**
   * The FUSED fit: slot table, prior bias, and OOV floor from ONE corpus
   * action. [[nbTrain]] + [[nbConstants]] need two-to-three separate
   * passes over the training text (the per-slot counts, their totals, and
   * the doc/token tallies); at 100 TB — and even at sf0.1, where the
   * composite q_nb_score paid a 4× job-count penalty over the oracle —
   * those passes are the whole cost, so this form folds everything into
   * a single bucket-bounded aggregation:
   *
   *  - every doc contributes its token slots PLUS one sentinel `-1`
   *    element, so the same groupBy(bucket) that counts per-slot class
   *    occurrences also counts documents per class (the bucket = -1 row);
   *  - the ≤ buckets+1 result rows collect once (the [[Importance
   *    .denseLut]] bounded contract — `buckets` ≤ MaxLutBuckets enforced),
   *    and P/N totals, per-slot llr, bias, and floor are all derived
   *    driver-side from that one result.
   *
   * Values are bit-identical to the unfused pair: the llr/bias/floor
   * rounding uses the same HALF_UP-on-decimal-repr semantics as Spark's
   * `round` (scala BigDecimal(d) == BigDecimal.valueOf(d), the path
   * Catalyst's Round takes on doubles), and P/N equal the slot-count sums
   * by construction. Equality is unit-pinned (ClassifySpec).
   */
  def nbFit(docs: DataFrame, textCol: String, labelCol: String,
            buckets: Int): NbModel = {
    require(buckets > 0 && buckets <= Importance.MaxLutBuckets,
      s"buckets=$buckets outside (0, ${Importance.MaxLutBuckets}] — nbFit " +
        "collects the slot table under the dense-LUT contract; use " +
        "nbTrain + nbScoreJoin past it")
    // fused slot computation (functions.TokenSlotsExpr: one md5 loop per
    // row, codegen'd) — bit-identical to the transform+hash32 Column
    // chain; a NULL text coalesces to no slots so the doc still counts
    // toward the sentinel prior row, matching nbConstants' count(*)
    val cnt = docs.select(col(labelCol).as("_y"),
        explode(concat(array(lit(-1L)),
          coalesce(TS.tokenSlots(TF.tokens(col(textCol)), buckets),
            array().cast("array<bigint>")))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(when(col("_y"), 1)).as("_p"),
           count(when(!col("_y"), 1)).as("_n"))
    val rows = cnt.collect() // bounded: ≤ buckets+1 rows by construction
    var pd = 0L; var nd = 0L; var ptot = 0L; var ntot = 0L
    rows.foreach { r =>
      if (r.getLong(0) < 0) { pd = r.getLong(1); nd = r.getLong(2) }
      else { ptot += r.getLong(1); ntot += r.getLong(2) }
    }
    val bias = roundScaled(math.log((pd + 1.0) / (nd + 1.0)))
    val floor = roundScaled(
      math.log(1.0 / (ptot + buckets.toDouble)) -
      math.log(1.0 / (ntot + buckets.toDouble)))
    val lut = Array.fill(buckets)(floor)
    rows.foreach { r =>
      val b = r.getLong(0)
      if (b >= 0) lut(b.toInt) = roundScaled(
        math.log((r.getLong(1) + 1.0) / (ptot + buckets.toDouble)) -
        math.log((r.getLong(2) + 1.0) / (ntot + buckets.toDouble)))
    }
    NbModel(lut, bias, floor)
  }

  /** Driver-side mirror of Spark's `round(x * 1e6).cast("long")`:
    * HALF_UP over the shortest-decimal representation of the double
    * (scala BigDecimal(d) uses java BigDecimal.valueOf, the same repr
    * Catalyst's Round rounds) — NOT java Math.round, whose half-toward-
    * positive-infinity disagrees on negative .5 boundaries. */
  private[operators] def roundScaled(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Score against a fused [[nbFit]] model: the dense LUT ships as a task
    * literal directly (no model-frame round trip, no second collect) and
    * scoring is the same shuffle-free scan-stage fold as the DataFrame
    * form — the whole train+score composite is ONE training action plus
    * the scoring pass. */
  def nbScore(docs: DataFrame, model: NbModel, textCol: String,
              keyCol: String): DataFrame =
    docs.select(col(keyCol), TF.tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col(keyCol),
        (TS.tokenSlotFold(col("_toks"), model.lut) + lit(model.bias)).as("_s"))
      .select(col(keyCol),
        round(col("_s").cast("double") / lit(1e6), 6).as("score"),
        (col("_s") > 0).as("pred"))

  /**
   * Score: one row per document, (key, score, pred) where
   * score = (bias + Σ_tok llr[slot(tok)]) / 1e6 and pred = score > 0.
   * Unseen slots take `floor`; docs with an EMPTY token array score
   * nothing (no output row — the join form's natural semantics, kept
   * identical here).
   *
   * Plan shape: the model collapses to a dense int64 LUT
   * ([[Importance.denseLut]]'s bounded driver-side contract, `floor`
   * pre-filled) and scoring is a SHUFFLE-FREE per-row integer fold in the
   * scan stage — the [[Importance.dsirScore]] machinery, so the two
   * curation scorers cannot drift in shape. The old broadcast-join +
   * per-doc aggregate form survives as [[nbScoreJoin]], the documented
   * fallback for model sizes past [[Importance.MaxLutBuckets]] (where an
   * 8 MB+ task literal would bloat every task binary); equality of the
   * two forms is unit-pinned.
   */
  def nbScore(docs: DataFrame, model: DataFrame, textCol: String,
              keyCol: String, buckets: Int, bias: Long,
              floor: Long): DataFrame =
    if (buckets <= Importance.MaxLutBuckets) {
      val lut = Importance.denseLut(model, "bucket", "llr", buckets, floor)
      docs.select(col(keyCol),
          transform(TF.tokens(col(textCol)),
            t => slot(t, buckets)).as("_slots"))
        .filter(size(col("_slots")) > 0)
        .select(col(keyCol),
          (Importance.lutFold(col("_slots"), lut) + lit(bias)).as("_s"))
        .select(col(keyCol),
          round(col("_s").cast("double") / lit(1e6), 6).as("score"),
          (col("_s") > 0).as("pred"))
    } else nbScoreJoin(docs, model, textCol, keyCol, buckets, bias, floor)

  /** The broadcast-join scoring form: explode token slots, left-join the
    * broadcast model, one (key, int64) row per doc through the final
    * shuffle. Same results as the LUT form (unit-pinned) at any model
    * size — the >MaxLutBuckets path. */
  def nbScoreJoin(docs: DataFrame, model: DataFrame, textCol: String,
                  keyCol: String, buckets: Int, bias: Long,
                  floor: Long): DataFrame =
    slots(docs, textCol, keyCol, buckets)
      .join(broadcast(model), Seq("bucket"), "left_outer")
      .groupBy(col(keyCol))
      .agg(sum(coalesce(col("llr"), lit(floor))).as("_s"))
      .select(col(keyCol),
        round((col("_s") + lit(bias)).cast("double") / lit(1e6), 6).as("score"),
        ((col("_s") + lit(bias)) > 0).as("pred"))
}
