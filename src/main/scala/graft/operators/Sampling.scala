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

  /** Reserved-name guard (the AsofJoin/Mutations discipline): an input
    * already carrying one of an operator's internal or output column
    * names would either throw an ambiguous-reference AnalysisException
    * after the internal join or — worse — be silently overwritten by the
    * withColumn and dropped on the way out. */
  private def requireNoReserved(df: DataFrame, names: Seq[String]): Unit = {
    val hit = df.columns.filter(c => names.exists(_.equalsIgnoreCase(c)))
    require(hit.isEmpty,
      s"input must not contain reserved columns: ${hit.toSeq.mkString(", ")}")
  }

  /** Keep keys whose bucket < `percent` (deterministic ~percent% sample). */
  def deterministicSample(df: DataFrame, keyCol: String, percent: Int,
                          buckets: Int = 100): DataFrame =
    df.filter(keyBucket(keyCol, buckets) < percent)

  /** Complementary (train, validation) split: validation = `valPercent`%,
    * train = the rest; union of the two == input, intersection == empty. */
  def trainValSplit(df: DataFrame, keyCol: String,
                    valPercent: Int): (DataFrame, DataFrame) = {
    // null keys hash to a NULL bucket, which fails BOTH three-valued
    // predicates — the row would vanish from train AND val, breaking the
    // complementary contract. Coalesce to bucket 99 routes them (and only
    // them) deterministically into train for any valPercent <= 99.
    val b = coalesce(keyBucket(keyCol), lit(99))
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

  /** Stratified deterministic sample: a different keep-percentage per
    * stratum (e.g. per language — upsample rare, downsample dominant).
    * Same pure key-hash membership as [[deterministicSample]], so each
    * stratum's subset is reproducible and strata never bleed; strata
    * absent from `percentByStratum` fall back to `defaultPercent`. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       percentByStratum: Map[String, Int],
                       defaultPercent: Int = 0,
                       buckets: Int = 100): DataFrame = {
    val threshold = percentByStratum.foldLeft(lit(defaultPercent)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.filter(keyBucket(keyCol, buckets) < threshold)
  }

  /** Weighted Bernoulli sample: each row keeps with probability
    * `weightCol` (a DOUBLE in [0,1] — e.g. a quality score, so higher-
    * quality documents survive downsampling more often, the standard
    * quality-weighted curation move). Same pure key-hash membership as
    * [[deterministicSample]]: the key's bucket (as a uniform draw in
    * [0,1)) is compared against the row's own weight, so membership is
    * reproducible anywhere and a re-run with a tweaked weight column only
    * flips rows whose weight crossed their fixed draw. Weights are
    * clamped to [0,1]; NULL weight drops the row. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     buckets: Int = 10000): DataFrame =
    df.filter(keyBucket(keyCol, buckets).cast("double") / buckets <
      least(greatest(col(weightCol), lit(0.0)), lit(1.0)))

  /** Rebalance a corpus toward a TARGET mixture: given per-group target
    * shares (e.g. the language mix the training run wants) and a total
    * row budget, each group keeps rows with probability
    * `min(1, budget * share_g / count_g)` via the same portable key-hash
    * draw as [[deterministicSample]] — so over-represented groups
    * downsample toward their share, under-represented groups keep
    * everything (shares are a ceiling, not an upsample: rows are never
    * duplicated). Groups with no declared share drop entirely (rate 0).
    *
    * Scale shape: the group counts are one map-side-combined agg whose
    * output is |groups| rows, broadcast back; membership stays a pure
    * per-row predicate — reproducible anywhere, no second pass over the
    * data. */
  def mixToTarget(df: DataFrame, keyCol: String, groupCol: String,
                  shares: Map[String, Double], budget: Long,
                  buckets: Int = 10000): DataFrame = {
    require(shares.values.forall(s => s >= 0 && s <= 1),
      "target shares must be in [0,1]")
    requireNoReserved(df, Seq("_cnt"))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_cnt"))
    // fold from 0.0, NOT null: `least` SKIPS nulls (both here and in
    // DuckDB), so a null share would silently become keep-rate 1.0 —
    // the exact opposite of "no share => drop"
    val share = shares.foldLeft(lit(0.0)) {
      case (acc, (g, v)) => when(col(groupCol) === g, lit(v)).otherwise(acc)
    }
    val rate = least(lit(1.0), lit(budget.toDouble) * share / col("_cnt"))
    df.join(broadcast(counts), Seq(groupCol))
      .filter(keyBucket(keyCol, buckets).cast("double") / buckets < rate)
      .drop("_cnt")
  }

  /**
   * Token-weighted mixture rebalance — [[mixToTarget]] with the budget in
   * TOKENS, which is what a training mixture actually is (a 0.4 share
   * means 40% of the token budget, not 40% of the documents; long docs
   * must count for what they cost). Keep-rate per group =
   * `min(1, budget · share_g / Σ weight_g)`; the draw stays the per-row
   * portable key-hash, so whole documents are kept or dropped and the
   * kept token mass per group lands on `rate · Σweight` in expectation
   * (the draw is independent of the weight). Weights are cast to long —
   * integer sums are exact and order-independent, so the group
   * denominators (and therefore the keep decisions) are engine-exact.
   *
   * Scale shape: identical to [[mixToTarget]] — one map-side-combined
   * weight-sum agg of |groups| rows broadcast back, membership a pure
   * scan-stage predicate.
   */
  def mixToTargetWeighted(df: DataFrame, keyCol: String, groupCol: String,
                          weight: org.apache.spark.sql.Column,
                          shares: Map[String, Double], budget: Long,
                          buckets: Int = 10000): DataFrame = {
    require(shares.values.forall(s => s >= 0 && s <= 1),
      "target shares must be in [0,1]")
    requireNoReserved(df, Seq("_w", "_wsum"))
    val wdf = df.withColumn("_w", weight.cast("long"))
    val sums = wdf.groupBy(col(groupCol)).agg(sum(col("_w")).as("_wsum"))
    val share = shares.foldLeft(lit(0.0)) {
      case (acc, (g, v)) => when(col(groupCol) === g, lit(v)).otherwise(acc)
    }
    val rate = least(lit(1.0), lit(budget.toDouble) * share / col("_wsum"))
    wdf.join(broadcast(sums), Seq(groupCol))
      .filter(keyBucket(keyCol, buckets).cast("double") / buckets < rate)
      .drop("_wsum", "_w")
  }

  /**
   * Quality-curriculum sampling: rank rows into `rates.length` quantile
   * buckets of `scoreCol` and keep each bucket at its own rate —
   * "sample the top quartile fully, thin the bottom" as one declarative
   * pass (`rates(0)` = lowest-score bucket). Bucket edges are the exact
   * interpolated percentiles rounded to 6 decimals (the [[q_winsorize]]
   * boundary discipline, so an edge cannot flip across engines), the
   * per-row bucket is `#edges strictly below score`, and membership is
   * the engine's standard portable key-hash draw. NULL scores cannot be
   * ranked and drop.
   *
   * Scale shape: ONE scalar aggregation computes all edges (the
   * approx_percentile swap is the 100 TB form, same plan), the 1-row
   * edge frame broadcasts, and the keep decision is a pure scan-stage
   * predicate — no window, no global sort, reproducible on any cluster.
   */
  def curriculumSample(df: DataFrame, keyCol: String, scoreCol: String,
                       rates: Seq[Double], buckets: Int = 10000): DataFrame = {
    require(rates.nonEmpty && rates.forall(r => r >= 0 && r <= 1),
      "per-bucket rates must be in [0,1]")
    requireNoReserved(df, Seq("_edges", "_sv"))
    val n = rates.length
    // one rate = one bucket = a plain deterministic sample: computing
    // (and corpus-buffering) an edge set that bucket = lit(0) would
    // never consult is pure waste — and the sortedVals aggregation is
    // the group-fits-in-memory regime, which a degenerate call must not
    // enter for nothing
    if (n == 1)
      return df.filter(col(scoreCol).isNotNull &&
        keyBucket(keyCol, buckets).cast("double") / buckets < rates.head)
    val qs = (1 until n).map(_.toDouble / n)
    // all edges read off ONE sorted buffer (Percentiles: ~2x faster than
    // the built-in OpenHashMap percentile aggregate, bit-identical); the
    // buffer dies inside the agg job — only the |rates|-1 doubles reach
    // the broadcast
    val edges = df.agg(Percentiles.sortedVals(col(scoreCol)).as("_sv"))
      .select(array(qs.map(q =>
        round(Percentiles.fromSorted(col("_sv"), q), 6)): _*).as("_edges"))
    // "#edges strictly below score" as a SUM of plain comparisons, not a
    // filter() lambda: higher-order array functions evaluate interpreted
    // per row while these codegen (A/B at sf0.1: the lambda form cost
    // ~0.3 s extra on a 150K-row probe)
    val bucket = (1 until n).map(i =>
        (element_at(col("_edges"), i) < col(scoreCol)).cast("int"))
      .reduce(_ + _)
    val rate = element_at(lit(rates.toArray), bucket + 1)
    df.crossJoin(broadcast(edges))
      .filter(col(scoreCol).isNotNull &&
        keyBucket(keyCol, buckets).cast("double") / buckets < rate)
      .drop("_edges")
  }

  /** Uniform-but-reproducible k per group — the per-domain cap where the
    * kept subset should be a RANDOM k (not the first k by some business
    * order, which [[perGroupQuota]] gives): rank within the group by the
    * portable md5 draw and keep k. Same window shuffle as any grouped op;
    * the draw is a pure key function, so the kept set is stable across
    * runs and engines while being uniform within each group. */
  def perGroupUniform(df: DataFrame, groupCol: String, keyCol: String,
                      k: Int, seed: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(seed + "-"), col(keyCol).cast("string"))))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Deterministic global shuffle — the "randomize the corpus before
    * training" step, as a pure function of the key: order by
    * `md5(seed || key)`. Reproducible across engines, runs, and cluster
    * sizes (unlike `orderBy(rand())`), and at scale it is one
    * range-partitioned sort whose keys are uniform BY CONSTRUCTION — no
    * skewed sort partitions regardless of how skewed the data keys are.
    * The order key is returned so downstream shard writers can range-split
    * on it without re-deriving the hash. */
  def deterministicShuffle(df: DataFrame, keyCol: String,
                           seed: String): DataFrame =
    df.withColumn("ord_key", md5(concat(lit(seed + "-"), col(keyCol).cast("string"))))
      .orderBy(col("ord_key"))

  /**
   * Sequence packing — assign documents to fixed token-budget bins for
   * training-batch assembly. `keyCol` must be UNIQUE within a shard (a
   * primary key): the running-sum window orders by it alone, and tied
   * sort keys would make the ROWS frame — and every later bin in the
   * shard — partition-layout-dependent, breaking the determinism
   * contract. Deterministic streaming definition: docs are
   * ordered by `keyCol` and bin(d) = floor(tokens_before_d / budget) —
   * i.e. the running token count partitions the ordered corpus into
   * budget-sized spans. A doc straddling a boundary belongs to the bin
   * where it STARTED (spans overflow by at most one doc, the standard
   * truncate-or-carry tradeoff made deterministic). This is one window
   * pass, SQL-expressible, and engine-independent — unlike greedy
   * first-fit packing, whose result depends on scan order and cannot be
   * reproduced across engines or partitionings. At scale the global
   * window over `keyCol` is a range-partitioned sort — for per-shard
   * packing, partition the window by a shard column first.
   */
  def packSequences(df: DataFrame, keyCol: String, tokenCountCol: String,
                    budget: Int, shardCol: Option[String] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = org.apache.spark.sql.expressions.Window
    // SHARDED is the 100 TB form: the running sum partitions by shard, so
    // each shard's window is an independent hash-partitioned sort. The
    // global form (shardCol = None) funnels every row through ONE ordered
    // window partition — only for corpora that fit a single task, or when
    // a globally contiguous bin numbering is a hard requirement.
    val w = (shardCol match {
      case Some(s) => base.partitionBy(col(s)).orderBy(col(keyCol).asc)
      case None    => base.orderBy(col(keyCol).asc)
    }).rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("bin",
      floor(coalesce(sum(col(tokenCountCol)).over(w), lit(0L)) / budget))
  }

  /**
   * Per-group quality-threshold calibration: instead of one global
   * cutoff, each group (typically language) gets the quality quantile
   * that keeps ~`keepRate` of ITS documents — the CCNet/Gopher practice
   * of calibrating filters per language so low-resource languages are
   * not wiped out by a threshold tuned on English. Output: the kept rows
   * as (key, group, quality, threshold).
   *
   * Determinism: quality is [[TF.qualityScore]] (already round(6)ed), the
   * threshold is the EXACT linear-interpolation percentile over those
   * rounded values, itself round(6)ed, and the gate compares the two
   * rounded numbers — every step replays bit-identically in any engine
   * with the same percentile definition (DuckDB's quantile_cont; the
   * oracle does exactly this).
   *
   * Scale shape, two regimes. Exact (default): the exact percentile
   * buffers every group value by definition, so the group fits one task
   * — the operator leans into that and runs ONE corpus pass (score once,
   * buffer (key, quality) per group, read the threshold off the same
   * sorted buffer, explode back gated) instead of scoring twice and
   * joining. At 10¹¹ docs pass `approx = true`: `approx_percentile` is a
   * mergeable constant-memory sketch, the aggregation becomes map-side-
   * combined partials feeding a broadcast of the |groups|-row threshold
   * table onto the scoring scan — the corpus never shuffles or buffers,
   * and the threshold error is bounded by the sketch accuracy (1/10000
   * relative rank), which moves the gate boundary by at most that
   * fraction of each group.
   */
  def calibratedQualityGate(docs: DataFrame, textCol: String,
                            keyCol: String, groupCol: String,
                            keepRate: Double,
                            approx: Boolean = false): DataFrame = {
    require(keepRate > 0.0 && keepRate < 1.0, "keepRate must be in (0, 1)")
    val scored = docs.select(col(keyCol), col(groupCol),
      TF.qualityScore(col(textCol)).as("quality"))
    val p = 1.0 - keepRate
    if (approx) {
      // 100 TB form: constant-memory mergeable sketch per group, then a
      // broadcast of the |groups|-row threshold table onto the scoring
      // scan — the corpus never shuffles and never buffers.
      val thr = scored.groupBy(col(groupCol))
        .agg(round(expr(s"approx_percentile(quality, $p, 10000)"), 6).as("threshold"))
      scored.join(broadcast(thr), Seq(groupCol))
        .filter(col("quality") >= col("threshold"))
        .select(col(keyCol), col(groupCol), col("quality"), col("threshold"))
    } else {
      // Exact form: the exact percentile buffers every group value by
      // definition, so the group already fits one task — make that ONE
      // pass (score once, buffer (key, quality), read the threshold off
      // the same sorted buffer, explode back gated) instead of scoring
      // the corpus twice and joining. Null-group rows can't join in the
      // broadcast form; the filter keeps that contract here. (Re-A/B'd
      // after the QualityCountsExpr fusion made scoring 3x cheaper: the
      // score-twice + broadcast-threshold form is STILL slower — 0.60 vs
      // 0.41 s isolated at sf0.1 — because the threshold subtree
      // serializes ahead of the probe stage; the buffer machinery
      // overlaps in one job.)
      scored.filter(col(groupCol).isNotNull)
        .groupBy(col(groupCol))
        .agg(collect_list(struct(col(keyCol), col("quality"))).as("_rows"),
          round(Percentiles.fromSorted(
            Percentiles.sortedVals(col("quality")), p), 6).as("threshold"))
        .select(col(groupCol), col("threshold"), explode(col("_rows")).as("_r"))
        .filter(col("_r.quality") >= col("threshold"))
        .select(col(s"_r.$keyCol").as(keyCol), col(groupCol),
          col("_r.quality").as("quality"), col("threshold"))
    }
  }

  /**
   * EXACT-k weighted sampling without replacement (Efraimidis–Spirakis
   * 2006, the log-priority form): each row draws a deterministic
   * uniform u from its key hash and gets priority `ln(u) / w` — the
   * top-k priorities are a weighted-without-replacement sample, the
   * guarantee [[weightedSample]]'s Bernoulli form can't give (that one
   * returns a BINOMIAL number of rows; a training-budget cut wants
   * exactly k). Weights are clamped to `minWeight` so a zero-quality
   * row keeps a defined (tiny) priority instead of dividing by zero.
   * Output: (key, weight, priority), the k winners.
   *
   * Determinism: u = (hash(key) % buckets + 1) / buckets ∈ (0, 1] — the
   * +1 keeps ln defined; priority is round(6)ed BEFORE ranking (`ln` is
   * the one last-ulp step, the [[temperatureMix]] pow discipline), ties
   * break on the key.
   *
   * Scale shape: a pure scan-stage priority column + TakeOrdered(k) —
   * no shuffle, no model; the distributed top-k is exactly how a
   * reservoir generalizes to a cluster.
   */
  def weightedTopK(df: DataFrame, keyCol: String, weightCol: String,
                   k: Int, buckets: Int = 10000,
                   minWeight: Double = 0.001): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (keyBucket(keyCol, buckets).cast("double") + 1.0) / buckets
    val w = greatest(col(weightCol), lit(minWeight))
    df.withColumn("priority", round(log(u) / w, 6))
      .orderBy(col("priority").desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol), col(weightCol), col("priority"))
  }

  /**
   * Temperature-scaled mixture rebalance — [[mixToTarget]] where the
   * target shares are COMPUTED from the corpus itself: share_g =
   * count_g^α / Σ_j count_j^α (the multilingual α-sampling of mC4 and
   * XLM-R: α = 1 preserves the natural distribution, α → 0 approaches
   * uniform, so low-resource groups are upweighted RELATIVE to their
   * natural share without duplicating rows — shares stay a ceiling).
   * Keep-rate per group = min(1, budget · share_g / count_g), membership
   * the same portable key-hash draw as every sampler here. Output: the
   * kept rows as (key, group, share, rate).
   *
   * Determinism: `pow` is the one non-exact step (Math.pow and another
   * engine's may differ in the last ulp), so the share AND the rate are
   * both round(6)ed before the rate ever meets the 1/`buckets`-granular
   * hash draw — a boundary flip would need the true rate within 1e-6 of
   * a bucket edge AND a pow discrepancy there, the standard boundary
   * discipline ([[curriculumSample]]'s edges).
   *
   * Scale shape: identical to [[mixToTarget]] — one map-side-combined
   * count agg of |groups| rows (the share normalization is a window over
   * that |groups|-row frame, not the corpus), broadcast back; membership
   * is a pure scan-stage predicate, the corpus never shuffles.
   */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
                     alpha: Double, budget: Long,
                     buckets: Int = 10000): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(budget > 0, "budget must be positive")
    requireNoReserved(df, Seq("_cnt", "share", "rate"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // NULL-group rows can never be kept (the equi-join below drops them),
    // so they must not count in the α-share normalization either — with
    // them in, every REAL group's share and rate deflate and the budget
    // is silently undershot (50% null-group rows ≈ half the intended
    // corpus out). The calibratedQualityGate null-group rule, applied to
    // the share denominator.
    val shares = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("_cnt"))
      .withColumn("share",
        round(pow(col("_cnt").cast("double"), alpha) /
          sum(pow(col("_cnt").cast("double"), alpha)).over(w), 6))
      .withColumn("rate",
        round(least(lit(1.0), lit(budget.toDouble) * col("share") / col("_cnt")), 6))
    df.join(broadcast(shares), Seq(groupCol))
      .filter(keyBucket(keyCol, buckets).cast("double") / buckets < col("rate"))
      .select(col(keyCol), col(groupCol), col("share"), col("rate"))
  }
}
