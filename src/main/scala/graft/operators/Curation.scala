package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/**
 * Rule-based corpus curation and token-budget planning — the two
 * published curation steps that sit AROUND the scoring operators
 * ([[graft.operators.Importance]], [[graft.operators.Classify]],
 * [[TermStats.perplexityBuckets]]): the hard Gopher rule gate that runs
 * before any model-based scorer, and the data-constrained epoch
 * allocator that decides how often each surviving slice repeats.
 */
object Curation {

  /** The published English stop-word probe list (Rae 2021 §A1.1 —
    * presence of >= 2 distinct members is the "is this prose at all"
    * smoke test). A PARAMETER default, not a constant: stop lists are
    * calibrated per language/corpus (the CCNet practice), so callers
    * pass their own for non-English or synthetic corpora. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher quality rules (Rae 2021, "MassiveText" filter §A1.1), the
   * word-level subset — this corpus has no line structure, so the
   * line-start-bullet / line-end-ellipsis rules are out of scope and the
   * remaining five published rules apply verbatim:
   *
   *  - `r_words`:   word count in [minWords, maxWords]
   *  - `r_meanlen`: mean word length in [3, 10] characters
   *  - `r_alpha`:   >= 80% of words contain an alphabetic character
   *  - `r_sym`:     symbol-to-word ratio (words carrying `#` or `...`)
   *                 <= 0.1
   *  - `r_stop`:    >= 2 distinct stop words present
   *
   * plus `keep` = the conjunction. Output keeps the raw integer counts
   * so a user can re-gate at different thresholds without re-tokenizing.
   *
   * Determinism: every rule is an INTEGER comparison — the ratio bounds
   * are cross-multiplied (`3·n <= sum_len <= 10·n`, `10·n_alpha >= 8·n`,
   * `10·n_sym <= n`) so there is no floating-point boundary to flip
   * across engines at all, stronger than the usual round(6) discipline.
   *
   * Scale shape: pure per-row scan-stage work (tokenize once, fold the
   * token array); no shuffle, no model, nothing collected. The gate is
   * a pushable-after-projection predicate: at 10¹¹ docs this is the
   * cheapest filter in the pipeline and should run FIRST, before any
   * scorer that shuffles or broadcasts.
   */
  def gopherRules(docs: DataFrame, textCol: String, keyCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  stops: Seq[String] = GopherStops): DataFrame = {
    require(stops.nonEmpty, "stop list must be non-empty")
    // fused codegen expression: ONE loop over the token array computes
    // all five counts — the HOF formulation (aggregate + 2 filters +
    // array_intersect) walks the array four times through interpreted
    // lambdas (BENCH_NOTES.md HOF ladder). The struct is deterministic
    // and lambda-free, so the five getField consumers CSE in codegen.
    val c = graft.functions.GopherFunctions
      .gopherCounts(TF.tokens(col(textCol)), stops)
    val counted = docs
      .select(col(keyCol), c.as("_c"))
      .select(
        col(keyCol),
        col("_c").getField("n_words").as("n_words"),
        col("_c").getField("sum_len").as("sum_len"),
        col("_c").getField("n_alpha").as("n_alpha"),
        col("_c").getField("n_sym").as("n_sym"),
        col("_c").getField("n_stop").as("n_stop"))
    counted
      .withColumn("r_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_meanlen",
        lit(3L) * col("n_words") <= col("sum_len") &&
          col("sum_len") <= lit(10L) * col("n_words"))
      .withColumn("r_alpha",
        lit(10L) * col("n_alpha") >= lit(8L) * col("n_words"))
      .withColumn("r_sym", lit(10L) * col("n_sym") <= col("n_words"))
      .withColumn("r_stop", col("n_stop") >= 2)
      .withColumn("keep",
        col("r_words") && col("r_meanlen") && col("r_alpha") &&
          col("r_sym") && col("r_stop"))
  }

  /**
   * The [[gopherRules]] gate as a single scan-stage FILTER that keeps all
   * of the corpus row's columns — for pipelines that consume the survivors
   * rather than the flags. `gopherGate(docs, …)` is row-identical to
   * `docs.join(gopherRules(docs, …).filter(keep).select(key), key)` under
   * unique keys (CurationRulesSpec-pinned, incl. null/empty text), but the
   * corpus text is scanned ONCE: the join form re-reads every doc's text
   * for the gate branch and again for the payload side (r18, guide §2.4).
   *
   * The counts struct rides an [[graft.functions.EvalOnceExpr]] barrier:
   * a bare projection would let predicate pushdown substitute the whole
   * counts expression into the Filter, where conjuncts are evaluated
   * short-circuit WITHOUT subexpression elimination — the five rule
   * conjuncts would tokenize the doc up to five times (FilterExec has no
   * CSE; only Project/Aggregate do). Pinned above the filter, the struct
   * computes once per row and the conjuncts read its fields.
   */
  def gopherGate(docs: DataFrame, textCol: String,
                 minWords: Int = 50, maxWords: Int = 100000,
                 stops: Seq[String] = GopherStops): DataFrame = {
    require(stops.nonEmpty, "stop list must be non-empty")
    val counts = graft.functions.EvalOnceExpr.evalOnce(
      graft.functions.GopherFunctions.gopherCounts(TF.tokens(col(textCol)), stops))
    val n = col("_gopher_c.n_words")
    docs.withColumn("_gopher_c", counts)
      .filter(
        n >= minWords && n <= maxWords &&
          lit(3L) * n <= col("_gopher_c.sum_len") &&
          col("_gopher_c.sum_len") <= lit(10L) * n &&
          lit(10L) * col("_gopher_c.n_alpha") >= lit(8L) * n &&
          lit(10L) * col("_gopher_c.n_sym") <= n &&
          col("_gopher_c.n_stop") >= 2)
      .drop("_gopher_c")
  }

  /**
   * Data-constrained epoch allocation (Muennighoff 2023, "Scaling
   * Data-Constrained Language Models"): given a token budget and a
   * target mixture over groups, decide how many EPOCHS (repeats,
   * fractional) of each group's token mass to train on —
   * `epochs_g = min(maxEpochs, budget·share_g / tokens_g)` — capping
   * repeats where the paper shows returns decay (~4 epochs) instead of
   * silently over-repeating a small slice to fill its share. Output:
   * (group, m_tokens, share, epochs, eff_tokens) — the training plan.
   * Groups absent from `shares` get share 0 and drop to 0 epochs.
   *
   * Determinism: token masses are exact int64 sums; `epochs` is round(6)
   * BEFORE the effective-token product so both sides of the oracle
   * multiply the identical double; `eff_tokens` rounds to a whole token.
   *
   * Scale shape: one map-side-combined aggregation returning |groups|
   * rows — the corpus is read once (token counting is a per-row fold)
   * and never shuffles; everything after the agg is arithmetic on a
   * frame the driver could hold a million groups of. The output is the
   * input to [[Sampling.mixToTargetWeighted]]-style rate gates, which
   * is where per-row work resumes.
   */
  def repeatEpochs(docs: DataFrame, textCol: String, groupCol: String,
                   shares: Map[String, Double], budgetTokens: Long,
                   maxEpochs: Double = 4.0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochs > 0.0, "maxEpochs must be positive")
    val shareCol = shares.foldLeft(lit(0.0)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    docs.groupBy(col(groupCol))
      .agg(sum(TF.tokenCount(col(textCol)).cast("long")).as("m_tokens"))
      .withColumn("share", shareCol)
      .withColumn("epochs",
        round(least(lit(maxEpochs),
          lit(budgetTokens.toDouble) * col("share") / col("m_tokens")), 6))
      .withColumn("eff_tokens",
        round(col("epochs") * col("m_tokens"), 0).cast("long"))
      .select(col(groupCol), col("m_tokens"), col("share"),
        col("epochs"), col("eff_tokens"))
  }

  /**
   * One DoReMi mixture-update step (Xie 2023, "DoReMi" eq. 2 — the
   * multiplicative-weights half that is pure data math): given per-group
   * reference shares and per-group excess losses (from whatever proxy
   * model the caller trains — that part is NOT a data-engine concern),
   * the updated share is `share_g ∝ ref_g · exp(η · loss_g)`,
   * renormalized. Groups the proxy finds hard (high excess loss) get
   * upweighted; iterating this converges to the domain-reweighted
   * mixture the paper trains on. Output: (group, ref_share, loss,
   * new_share).
   *
   * Determinism: `exp` is the one non-exact step — the unnormalized
   * weight AND the normalized share are both round(6)ed (the
   * [[Sampling.temperatureMix]] pow discipline).
   *
   * Scale shape: the input is ALREADY the |groups|-row frame (losses
   * come from training telemetry, not a corpus scan); one bounded
   * window normalizes it. Feed the output shares straight into
   * [[repeatEpochs]] or [[Sampling.mixToTarget]] — that's where the
   * corpus-sized work lives, and it never shuffles there either.
   */
  def doremiStep(domains: DataFrame, groupCol: String, refShareCol: String,
                 lossCol: String, eta: Double): DataFrame = {
    require(eta > 0.0, "eta must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // max-shift the exponent before rounding (the softmax/logsumexp
    // trick, here for the ROUNDING's sake): round(_w, 6) underflows to 0
    // for magnitudes below 5e-7, and with many small-ref-share domains
    // and negative excess losses EVERY weight could round to 0 — sum 0,
    // all shares NULL. Shifting by max(loss) makes the largest weight
    // O(max ref_share), cancels exactly in the normalization, and keeps
    // the round-before-normalize determinism discipline (max over
    // round(6)ed losses is exact cross-engine).
    domains
      .withColumn("_w",
        round(col(refShareCol) *
          exp(lit(eta) * (col(lossCol) - max(col(lossCol)).over(w))), 6))
      .withColumn("new_share", round(col("_w") / sum(col("_w")).over(w), 6))
      .select(col(groupCol), col(refShareCol), col(lossCol),
        col("new_share"))
  }
}
