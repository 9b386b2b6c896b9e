package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/**
 * Similarity search over an embedding column — the Spark equivalent of the
 * reference's VectorFilter scan (reference: proto/hydraide.proto:2688-2711,
 * filter_native.go:528-585), extended with the ANN path a 100 TB corpus
 * needs.
 *
 * Brute force is a single codegen'd scan: the custom DotProductConst
 * expression evaluates one primitive loop per row, then TakeOrderedAndProject
 * keeps per-partition top-K and merges K rows on the driver — no shuffle of
 * the vectors themselves. The IVF variant cuts scanned rows by routing the
 * query to the nearest coarse centroids first; centroid assignment is a
 * broadcast of (nlist x dim) floats, so the big table still never shuffles.
 */
object Similarity {

  /** Exact top-k by cosine against a constant query vector. Deterministic
    * tie-break on the key. Dimension-mismatched rows are excluded. */
  def bruteForceTopK(df: DataFrame, vecCol: String, keyCol: String,
                     query: Array[Float], k: Int): DataFrame =
    df.filter(size(col(vecCol)) === query.length)
      .withColumn("score", VF.cosine(col(vecCol), query))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol), round(col("score"), 6).as("score"))

  /** Rows whose cosine vs the query clears a threshold (VectorFilter).
    * The score rides an [[graft.functions.EvalOnceExpr]] barrier: bare,
    * predicate pushdown clones the cosine below the projection and every
    * SURVIVOR pays the dot loop twice (once in the pushed filter, again in
    * the projection) — the q_json_extract duplication, vector-shaped. */
  def thresholdScan(df: DataFrame, vecCol: String, keyCol: String,
                    query: Array[Float], minSim: Double): DataFrame =
    df.filter(size(col(vecCol)) === query.length)
      .withColumn("score",
        graft.functions.EvalOnceExpr.evalOnce(VF.cosine(col(vecCol), query)))
      .filter(col("score") >= minSim)
      .select(col(keyCol), round(col("score"), 6).as("score"))

  /** Seeded, L2-normalized coarse centroids — exposed so the DuckDB oracle
    * can embed the exact same constants (differential-testing requirement). */
  def ivfCentroids(nlist: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nlist) {
      val v = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
  }

  /** The nprobe nearest centroid ids for a query — double-precision,
    * ascending-index accumulation, the SAME arithmetic as the row-side
    * assignment and the DuckDB mirror, so the probed set is
    * engine-independent. One definition shared by [[ivfTopK]] and
    * [[ivfTopKPrebuilt]]: the oracle pins this exact tie-break, and two
    * drifting copies would be a test-visible correctness drift. */
  private def probedLists(centroids: Array[Array[Float]], query: Array[Float],
                          nprobe: Int): Seq[Int] = {
    val qScores = centroids.map(
      _.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum)
    qScores.zipWithIndex.sortBy(-_._1).take(nprobe).map(_._2).toIndexedSeq
  }

  /**
   * IVF-style ANN, per-query-assignment form: deterministic seeded coarse
   * centroids; each row assigned to its nearest centroid (argmax over nlist
   * constant dots); the query probes `nprobe` nearest lists and brute-forces
   * only those rows. For repeated querying use [[ivfBuild]] +
   * [[ivfTopKPrebuilt]], which precompute the assignment and turn the probe
   * into a partition-pruned scan.
   */
  def ivfTopK(df: DataFrame, vecCol: String, keyCol: String,
              query: Array[Float], k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 7L): DataFrame = {
    val dim = query.length
    val centroids = ivfCentroids(nlist, dim, seed)

    // nearest-centroid id as a column: argmax over nlist constant dots
    // (struct max = lexicographic on (score, i): ties pick the larger i)
    val assign = (0 until nlist).map { i =>
      struct(VF.cosine(col(vecCol), centroids(i)).as("s"), lit(i).as("i"))
    }
    val listId = array_max(array(assign: _*))("i")

    val probed = probedLists(centroids, query, nprobe)

    df.filter(size(col(vecCol)) === dim)
      .withColumn("_list", listId)
      .filter(col("_list").isin(probed: _*))
      .withColumn("score", VF.cosine(col(vecCol), query))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol), round(col("score"), 6).as("score"))
  }

  /**
   * Materialize the IVF index: assign every row its nearest coarse centroid
   * ONCE and write partitioned by `_list`. This is the 100 TB form — the
   * per-query variant above recomputes nlist dot products per row per
   * query; after this one-time build, a query is a PARTITION-PRUNED scan of
   * nprobe/nlist of the data (verify: PartitionFilters in the scan node).
   */
  def ivfBuild(df: DataFrame, vecCol: String, keyCol: String, outPath: String,
               dim: Int, nlist: Int = 16, seed: Long = 7L): Unit =
    ivfBuildWith(df, vecCol, outPath, ivfCentroids(nlist, dim, seed))

  /** [[ivfBuild]] with EXPLICIT coarse centroids — the consumer of
    * [[kmeansCentroids]]: train on (a sample of) the corpus, then build
    * the index on the trained lists. Same layout, same probe paths.
    *
    * Lifecycle ([[IndexLifecycle]], the text-index scheme): the lists land
    * under an immutable `outPath/v=N` staged completely — including the
    * FROZEN `_centroids` table [[appendIvfIndex]] routes later batches
    * with — before the `_current` pointer flips, so a rebuild over a live
    * index never tears a concurrent probe. */
  def ivfBuildWith(df: DataFrame, vecCol: String, outPath: String,
                   centroids: Array[Array[Float]]): Unit = {
    val spark = df.sparkSession
    val dim = centroids.head.length
    val next = IndexLifecycle.nextVersion(spark, outPath)
    val vdir = s"$outPath/v=$next"
    val assign = centroids.indices.map { i =>
      struct(VF.cosine(col(vecCol), centroids(i)).as("s"), lit(i).as("i"))
    }
    df.filter(size(col(vecCol)) === dim)
      .withColumn("_list", array_max(array(assign: _*))("i"))
      .write.mode("overwrite").partitionBy("_list").parquet(vdir)
    writeCentroids(spark, centroids, vdir)
    IndexLifecycle.flipPointer(spark, outPath, next)
  }

  /** Extend a prebuilt IVF index with NEW rows: each batch row routes to
    * its list with the index's own FROZEN `_centroids` table (a rebuild
    * would re-encode the whole corpus; a daily crawl must not), and the
    * rows append into the right `_list=` partition directories of the
    * CURRENT version — files only accumulate, so a reader that listed
    * before the append sees a consistent older state. Keys must be NEW
    * (the [[TermStats.appendTextIndex]] contract); append == rebuild on
    * probe results is unit-pinned. Single-writer: never concurrent with
    * a rebuild ([[IndexLifecycle]]'s contract). */
  def appendIvfIndex(batch: DataFrame, vecCol: String, keyCol: String,
                     indexPath: String): Unit = {
    val dir = IndexLifecycle.resolveDir(batch.sparkSession, indexPath)
    ivfAppendPlan(batch, vecCol, dir)
      .write.mode("append").partitionBy("_list").parquet(dir)
  }

  /** [[appendIvfIndex]] with EXACTLY-ONCE effect under micro-batch replay
    * ([[IndexLifecycle.appendOnce]] — a replayed raw append leaves
    * duplicate rows in the routed lists: duplicated probe hits and doubled
    * list scans). Returns false on the replay no-op. `runId`:
    * restart-stable (checkpoint path / `query.id`). */
  def appendIvfIndexOnce(batch: DataFrame, vecCol: String, keyCol: String,
                         indexPath: String, runId: String,
                         batchId: Long): Boolean =
    // plan construction (the centroid collect) stays inside the callback:
    // a no-op replay must run no Spark action
    IndexLifecycle.appendOnce(batch.sparkSession, indexPath, runId, batchId) {
      staging =>
        ivfAppendPlan(batch, vecCol,
            IndexLifecycle.resolveDir(batch.sparkSession, indexPath))
          .write.mode("overwrite").partitionBy("_list").parquet(staging)
    }

  /** The shared append body: the batch routed on the index's own FROZEN
    * `_centroids`, dim-guarded (both commit disciplines write identical
    * bytes and the staged `_list=` layout mirrors the live one, so the
    * move lands each file in its right list directory). */
  private def ivfAppendPlan(batch: DataFrame, vecCol: String,
                            dir: String): DataFrame = {
    val centroids = readCentroids(batch.sparkSession, dir)
    val dim = centroids.head.length
    val assign = centroids.indices.map { i =>
      struct(VF.cosine(col(vecCol), centroids(i)).as("s"), lit(i).as("i"))
    }
    requireAppendDim(batch, vecCol, dim)
      .filter(col(vecCol).isNotNull)
      .withColumn("_list", array_max(array(assign: _*))("i"))
  }

  /** Loud-refusal dim guard for the APPEND paths: a batch whose vectors
    * disagree with the index dimension must abort, not silently filter
    * to nothing — the daily-crawl embedding-model upgrade would
    * otherwise "append" zero rows forever while every job reports
    * success (the [[requireMatchingM]] hazard, one step earlier). Null
    * vectors stay droppable hygiene (the encode paths' contract); only
    * a PRESENT wrong-width vector raises, in the plan, on the first
    * such row. */
  private def requireAppendDim(batch: DataFrame, vecCol: String,
                               dim: Int): DataFrame =
    batch.withColumn(vecCol,
      when(col(vecCol).isNull || size(col(vecCol)) === dim, col(vecCol))
        .otherwise(raise_error(concat(
          lit("append vector dim "), size(col(vecCol)).cast("string"),
          lit(s" does not match the index dim=$dim — the batch would be " +
            "silently dropped; fix the embedding pipeline or rebuild the " +
            "index at the new dimension")))))

  /** The frozen routing constants ride inside the version directory (the
    * `_codebook` discipline applied to coarse centroids) so append-time
    * assignment can never drift from build-time assignment. Floats are
    * stored bit-exactly (parquet FLOAT) and read back verbatim; the
    * leading underscore keeps the table invisible to the partitioned
    * list scan sharing the directory. */
  private def writeCentroids(spark: org.apache.spark.sql.SparkSession,
                             centroids: Array[Array[Float]],
                             vdir: String): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      centroids.zipWithIndex.map { case (row, i) =>
        org.apache.spark.sql.Row(i, row.toSeq)
      }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = false),
          nullable = false))))
      .write.mode("overwrite").parquet(s"$vdir/_centroids")
  }

  /**
   * Per-(version dir) memo for the frozen model tables a probe must hold
   * as driver literals (codebooks, centroids): `_codebook`/`_centroids`
   * are written once per `v=N` and NEVER modified inside it (appends only
   * grow `codes/` — the frozen-codebook contract), so the collected array
   * is immutable for the lifetime of the key and a repeated serving probe
   * skips the ~0.1-0.2 s planning+codegen mini-action the collect costs
   * (the BENCH_NOTES eager-collect finding, applied to the one collect
   * that MUST stay eager because the ADC kernel needs a literal LUT).
   * A rebuild flips the pointer to a NEW v=N+1 → a new key; bounded by a
   * size cap so a build-heavy test session cannot hoard.
   */
  private val modelMemo =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]
  private def memoized[T <: AnyRef](key: String)(load: => T): T = {
    if (modelMemo.size > 256) modelMemo.clear() // crude cap; reload is cheap
    modelMemo.getOrElseUpdate(key, load).asInstanceOf[T]
  }

  /** Cheap content fingerprint of a frozen model table, folded into the
    * memo key: an artifact root deleted and rebuilt OUT-OF-BAND to the
    * same v=N path (test fixtures, a manual wipe — the CAS lifecycle
    * itself never reuses a version number) changes the file set's
    * lengths/mtimes, so the stale codebook/centroid literals are
    * re-collected instead of silently corrupting ADC rankings. One FS
    * listing per probe — noise next to the collect it guards. */
  private def tableFingerprint(spark: org.apache.spark.sql.SparkSession,
                               path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else fs.listStatus(p).toSeq.sortBy(_.getPath.getName)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .mkString(",").hashCode.toString
  }

  /** Bounded nlist-row collect — the codebook-collect contract class. */
  private def readCentroids(spark: org.apache.spark.sql.SparkSession,
                            vdir: String): Array[Array[Float]] =
    memoized(s"centroids|$vdir|" +
        tableFingerprint(spark, s"$vdir/_centroids")) {
      val p = s"$vdir/_centroids"
      require(new org.apache.hadoop.fs.Path(p).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
          .exists(new org.apache.hadoop.fs.Path(p)),
        s"$vdir has no _centroids table — a pre-versioning legacy index " +
          "cannot be appended to; rebuild with ivfBuild/ivfBuildWith first")
      spark.read.parquet(p).orderBy(col("i")).collect()
        .map(_.getSeq[Float](1).toArray)
    }

  /** The centroids a prebuilt probe must ROUTE with: the index's own
    * frozen `_centroids` table when present — an index built with
    * TRAINED centroids ([[ivfBuildWith]] + [[kmeansCentroids]]) lays its
    * lists out by them, and routing with the seeded defaults instead
    * would select lists uncorrelated with that layout (near-zero recall,
    * no error). Falls back to the seeded hyperplanes only for legacy
    * dirs that predate the table. For a seeded build the table CONTAINS
    * the seeded centroids, so reading it changes nothing there. */
  private def routingCentroids(spark: org.apache.spark.sql.SparkSession,
                               dir: String, nlist: Int, dim: Int,
                               seed: Long): Array[Array[Float]] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_centroids")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) readCentroids(spark, dir)
    else ivfCentroids(nlist, dim, seed)
  }

  /** [[ivfTopKPrebuilt]] against an index built with explicit (e.g.
    * trained) centroids: the probe set derives from the SAME centroid
    * array the build used — pass the same value or the routing lies. */
  def ivfTopKPrebuiltWith(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                          vecCol: String, keyCol: String,
                          query: Array[Float], k: Int,
                          centroids: Array[Array[Float]], nprobe: Int = 4): DataFrame =
    ivfTopKPrebuiltFiltered(spark, indexPath, vecCol, keyCol, query, k,
      lit(true), centroids, nprobe)

  /**
   * Metadata-FILTERED ANN over a prebuilt IVF index — the vector-database
   * serving pattern ("nearest neighbors WHERE label = x"): the index
   * retains every metadata column of the frame it was built from
   * ([[ivfBuild]] writes the whole row), so the predicate evaluates IN
   * the probe scan, BEFORE ranking — post-filtering a plain top-k would
   * return fewer than k (or zero) matches when the filter is selective.
   *
   * Scale shape: routing still prunes to nprobe/nlist of the partitions;
   * the predicate is an ordinary pushable scalar filter on those files
   * (`PushedFilters` carries it to the parquet reader when it is a
   * plain comparison), then the same TakeOrdered(k) as the unfiltered
   * probe. Recall caveat (the standard filtered-ANN trade-off): with a
   * selective predicate the k survivors of nprobe lists may under-fill —
   * raise nprobe for filtered traffic rather than post-filtering.
   */
  def ivfTopKPrebuiltFiltered(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String, vecCol: String, keyCol: String,
                              query: Array[Float], k: Int,
                              predicate: org.apache.spark.sql.Column,
                              centroids: Array[Array[Float]],
                              nprobe: Int = 4): DataFrame = {
    val probed = probedLists(centroids, query, nprobe)
    graft.Tables.artifact(spark, IndexLifecycle.resolveDir(spark, indexPath))
      .filter(col("_list").isin(probed: _*)) // partition pruning
      .filter(predicate)
      .withColumn("score", VF.cosine(col(vecCol), query))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol), round(col("score"), 6).as("score"))
  }

  /**
   * Cluster-diverse ANN over a prebuilt IVF index: at most `perList`
   * results per IVF list (the lists ARE the coarse clusters, so capping
   * per list is the standard cheap diversification — a redundant result
   * set where the whole top-k sits in one tight cluster spreads across
   * clusters instead, the serving-side cousin of [[prototypePrune]]).
   * Output: (key, cluster, score), the global top-k AFTER the per-list
   * cap, same (score desc, key asc) order discipline as every probe.
   *
   * Scale shape: identical scan to [[ivfTopKPrebuiltFiltered]] (nprobe
   * partition-pruned lists), plus ONE window partitioned by `_list` —
   * the probed lists are already the read partitions, so the rank adds
   * no extra shuffle of consequence (nprobe · listSize rows), then the
   * same TakeOrdered(k).
   */
  def ivfTopKPrebuiltDiverse(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String, vecCol: String, keyCol: String,
                             query: Array[Float], k: Int, perList: Int,
                             centroids: Array[Array[Float]],
                             nprobe: Int = 4): DataFrame = {
    require(perList > 0, "perList must be positive")
    val probed = probedLists(centroids, query, nprobe)
    val byList = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_list"))
      .orderBy(col("score").desc, col(keyCol).asc)
    graft.Tables.artifact(spark, IndexLifecycle.resolveDir(spark, indexPath))
      .filter(col("_list").isin(probed: _*)) // partition pruning
      .withColumn("score", VF.cosine(col(vecCol), query))
      // vectors are consumed by the score above; only (key, list, score)
      // may enter the rank exchange — explicit, not left to ColumnPruning
      .select(col(keyCol), col("_list"), col("score"))
      .withColumn("_rn", row_number().over(byList))
      .filter(col("_rn") <= perList)
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol), col("_list").as("cluster"),
        round(col("score"), 6).as("score"))
  }

  /**
   * Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998) of an
   * ANN candidate set: greedily select k results maximizing
   * `λ·rel − (1−λ)·max_{s∈selected} dot(c, s)` — relevance traded
   * against redundancy to everything already picked. The first pick is
   * the plain relevance argmax (no penalty exists yet); every score is
   * round(6)ed BEFORE comparison (the repo-wide boundary discipline),
   * ties break on the ascending numeric key. Output: (key, rel, mmr,
   * rank) where `mmr` is the score AT selection time and `rank` the
   * selection order.
   *
   * Scale shape: MMR is sequential in k BY DEFINITION (each pick changes
   * every remaining score), so the published serving shape is exactly
   * this — an ANN stage fans 10¹¹ vectors down to a top-n candidate
   * relation, and MMR re-ranks that bounded tail. The collect here is a
   * CONTRACT-BOUNDED driver step (`maxCandidates`, default 4096 rows ·
   * dim doubles ≈ 2 MB at dim 64), not a distributed-work smell; the
   * distributed half of the problem is the candidate generator
   * ([[ivfTopKPrebuiltWith]] et al.). A million-query batch runs this
   * per query inside its serving tier, not as one Spark job.
   *
   * Determinism: driver arithmetic replays the oracle exactly — dots
   * accumulate left-to-right in double (the [[functions.DotProductConst]]
   * order), round(6) is decimal HALF_UP (Spark's `round` convention,
   * half-away-from-zero like the oracle engine's), λ and (1−λ) are the
   * SAME IEEE doubles interpolated into the generated oracle SQL.
   */
  def mmrRerank(candidates: DataFrame, vecCol: String, keyCol: String,
                relCol: String, k: Int, lambda: Double,
                maxCandidates: Int = 4096): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = candidates.sparkSession
    // the bound is enforced BEFORE the full collect: limit(max+1) caps
    // what can ever reach the driver, so an accidentally corpus-sized
    // candidate frame produces the contract error below, not a driver OOM
    // inside the very collect the require was written to prevent
    val rows = candidates
      .select(col(keyCol).cast("long").as("_k"),
        col(vecCol).cast("array<double>"), round(col(relCol), 6))
      .limit(maxCandidates + 1)
      .collect()
    require(rows.length <= maxCandidates,
      s"mmrRerank is a bounded re-rank of an ANN candidate set: got " +
        s"more than maxCandidates=$maxCandidates candidates — " +
        "narrow the generator, don't re-rank a corpus")
    // numeric-key contract, failed loudly: a non-numeric key casts to
    // NULL and would otherwise surface as an opaque NullPointerException
    // from getLong deep in the selection loop
    require(rows.forall(!_.isNullAt(0)),
      s"mmrRerank keys must be numeric and non-null: '$keyCol' cast to " +
        "long produced NULLs — re-key the candidates (the tie-break " +
        "contract orders by the numeric key)")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val pool = scala.collection.mutable.ArrayBuffer(rows.map(r =>
      (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))): _*)
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Double, Int)] // key, rel, mmr, rank
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    var rank = 1
    while (rank <= k && pool.nonEmpty) {
      val scored = pool.map { case (key, v, rel) =>
        val mmr =
          if (pickedVecs.isEmpty) rel
          else r6(lambda * rel -
            (1 - lambda) * pickedVecs.map(s => r6(dot(v, s))).max)
        (key, v, rel, mmr)
      }
      val best = scored.minBy { case (key, _, _, mmr) => (-mmr, key) }
      picked += ((best._1, best._3, best._4, rank))
      pickedVecs += best._2
      pool.remove(pool.indexWhere(_._1 == best._1))
      rank += 1
    }
    import spark.implicits._
    picked.toSeq.toDF(keyCol, relCol, "mmr", "rank")
  }

  /**
   * Batch ANN against a prebuilt index: top-k for EVERY query row in one
   * plan — the 100 TB serving pattern (millions of queries as a relation,
   * not one driver-side vector). Each query row derives its nprobe probe
   * lists from the broadcast centroid constants (per-row sort of nlist
   * scored structs, ties broken on the list id — the same (score desc,
   * id asc) order as the single-query form), explodes to (query, list)
   * rows, and joins the index on `_list`: a plain shuffle join
   * CO-PARTITIONED with the index's own layout, touching nprobe/nlist of
   * the index per query. Ranking is a per-query window top-k.
   *
   * `queryKeyCol` must be UNIQUE across `queries` (a primary key): the
   * ranking window partitions by it, so duplicate keys would merge two
   * queries' candidate pools into one interleaved top-k.
   */
  def ivfTopKBatchPrebuilt(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                           queries: DataFrame, queryKeyCol: String, queryVecCol: String,
                           vecCol: String, keyCol: String, k: Int, dim: Int,
                           nlist: Int = 16, nprobe: Int = 4, seed: Long = 7L): DataFrame = {
    val dir = IndexLifecycle.resolveDir(spark, indexPath)
    // route with the index's OWN centroids (trained or seeded) — seeded
    // recomputation here silently mis-routed trained-centroid indexes
    val centroids = routingCentroids(spark, dir, nlist, dim, seed)
    val scored = array(centroids.indices.map { i =>
      struct(VF.cosine(col(queryVecCol), centroids(i)).as("s"), lit(i).as("i"))
    }: _*)
    val desc = udfFreeComparatorSort(scored)
    val probes = queries
      .filter(size(col(queryVecCol)) === dim)
      .select(col(queryKeyCol).as("qid"), col(queryVecCol).as("_qv"),
        explode(transform(slice(desc, 1, nprobe), x => x("i"))).as("_list"))
    val idx = graft.Tables.artifact(spark, dir)
      .select(col(keyCol), col(vecCol), col("_list"))
    val joined = probes.join(idx, Seq("_list"))
      .select(col("qid"), col(keyCol),
        VF.dot(col(vecCol), col("_qv")).as("_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("_score").desc, col(keyCol).asc)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col(keyCol), round(col("_score"), 6).as("score"))
  }

  /**
   * Contrastive hard-negative mining: for every query row, the k corpus
   * rows MOST similar by dot product whose label differs from the
   * query's — the negative-mining step of bi-encoder retriever training
   * (Karpukhin 2020's "hard negatives", run over the embedding space
   * itself). Labels are excluded BEFORE ranking, so same-label positives
   * never crowd negatives out of the top-k; scores round(6) BEFORE the
   * window rank so the order is engine-exact. Output: (qid, key, score).
   *
   * Scale shape: the query batch is model-sized by contract and
   * BROADCASTS (the non-equi label predicate makes this a broadcast
   * nested-loop against |queries| rows — each corpus row tests the tiny
   * batch in-task; no corpus shuffle to score). The one real shuffle is
   * the per-qid window over (qid, key, score) — |queries|·|corpus| pairs,
   * the irreducible output of exact batch scoring. When the batch grows
   * past broadcast size, route through a prebuilt IVF index first
   * ([[ivfTopKBatchPrebuilt]]'s pattern with the label filter on the
   * routed rows) so each query scores nprobe/nlist of the corpus.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, vecCol: String,
                    keyCol: String, labelCol: String, k: Int,
                    dim: Int): DataFrame = {
    val q = queries.filter(size(col(vecCol)) === dim)
      .select(col(keyCol).as("qid"), col(labelCol).as("_qlabel"),
        col(vecCol).as("_qv"))
    val scored = corpus.filter(size(col(vecCol)) === dim)
      .join(broadcast(q), col(labelCol) =!= col("_qlabel"))
      .select(col("qid"), col(keyCol),
        round(VF.dot(col(vecCol), col("_qv")), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col(keyCol).asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col(keyCol), col("score"))
  }

  /** (score desc, id asc) sort of an array of (s, i) structs — the
    * comparator form of the single-query probe ranking. */
  private def udfFreeComparatorSort(arr: org.apache.spark.sql.Column) =
    array_sort(arr, (l, r) =>
      when(l("s") > r("s"), -1).when(l("s") < r("s"), 1)
        .otherwise(when(l("i") < r("i"), -1).when(l("i") > r("i"), 1).otherwise(0)))

  /** Query a prebuilt IVF index (written by [[ivfBuild]] with the same
    * nlist/seed): routes to the nprobe nearest lists — a partition filter,
    * so only nprobe/nlist of the files are read — then brute-forces those
    * rows. Results are identical to [[ivfTopK]] on the same parameters. */
  def ivfTopKPrebuilt(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                      vecCol: String, keyCol: String,
                      query: Array[Float], k: Int,
                      nlist: Int = 16, nprobe: Int = 4, seed: Long = 7L): DataFrame =
    ivfTopKPrebuiltWith(spark, indexPath, vecCol, keyCol, query, k,
      routingCentroids(spark, IndexLifecycle.resolveDir(spark, indexPath),
        nlist, query.length, seed), nprobe)

  // =========================================================================
  // IVF centroid TRAINING — distributed Lloyd refinement in exact integer
  // space. Seeded hyperplane centroids route correctly but ignore the data
  // distribution; a few Lloyd passes move them onto the corpus's actual
  // density, which is what bounds IVF probe recall at scale.
  //
  // Cross-engine determinism design: floating-point Lloyd is NOT
  // reproducible across engines (per-cluster mean = a float sum whose value
  // depends on reduction order), so every accumulated quantity here is an
  // exact 64-bit integer. Vectors quantize once to round(x * scale) longs;
  // per-cluster centroid state is the exact integer SUM plus the count
  // (never the divided mean); assignment scores are dot(ivec, csum)/n where
  // the int64 dot is exact and order-independent, the int64→double
  // conversion and the one division are deterministic IEEE operations.
  // Bounds at scale=1e6, dim 64, |x|≤2: |ivec_i| ≤ 2e6, |csum_i| ≤ n·2e6,
  // dot ≤ 64·2e6·n·2e6 = n·2.6e14 — int64-safe to n ≈ 36k rows per cluster
  // at full magnitude (far larger in practice since embeddings are
  // unit-norm-ish); beyond that, raise `scale` down or sub-sample the
  // update. Seeds are the k rows with the smallest md5(key) — the engine's
  // standard reproducible draw — so init is identical in any engine.
  //
  // Scale shape per pass: assignment is pure scan-stage (k·d longs ride the
  // plan as literals — broadcast-sized by contract); the update is ONE
  // map-side-combined (cid, pos) aggregation whose k·d-row result returns
  // to the driver. That is textbook distributed Lloyd: iterations cost one
  // bounded shuffle each, the corpus never moves.
  // =========================================================================

  /** Integer-quantized vectors: (key, ivec). Rows without a key or a
    * vector — or with the WRONG dimension — cannot be clustered and are
    * excluded up front: a NULL or short-padded dot would otherwise hit
    * engine-specific NULL handling inside the argmin (Spark's zip_with
    * pads with NULLs, DuckDB's list_sum skips them — one malformed row
    * would silently desync engine and oracle). */
  private def quantize(df: DataFrame, vecCol: String, keyCol: String,
                       scale: Double, dim: Int): DataFrame =
    df.filter(col(keyCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) === dim)
      .select(col(keyCol).as("key"),
        transform(col(vecCol),
          x => round(x.cast("double") * scale).cast("long")).as("ivec"))

  /** Centroid state: exact integer element sums + member count. */
  final case class CentroidState(csum: Array[Long], n: Long)

  /** Deterministic seeds: the k smallest rows by (md5(key), key). */
  private def kmeansSeeds(scaled: DataFrame, k: Int): Array[CentroidState] =
    scaled.orderBy(md5(col("key").cast("string")), col("key")).limit(k)
      .select(col("ivec")).collect()
      .map(r => CentroidState(r.getSeq[Long](0).toArray, 1L))

  /** Assign every row to the centroid maximizing dot(ivec, csum)/n
    * (mean inner product to members); ties break to the lower cid.
    * Pure scan-stage: k dot-product columns over literal arrays. The
    * winning score rides along as `_score` (the row's prototypicality —
    * [[prototypePrune]] ranks on it); [[kmeansAssignments]] drops it. */
  private def kmeansAssignOnce(scaled: DataFrame,
                               cs: Array[CentroidState]): DataFrame = {
    val candidates = cs.zipWithIndex.map { case (c, i) =>
      val dot = aggregate(
        zip_with(col("ivec"), array(c.csum.map(lit(_)): _*), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
      // least() over (negated score, cid) = (score DESC, cid ASC)
      struct((-(dot.cast("double") / lit(c.n.toDouble))).as("neg"),
        lit(i.toLong).as("cid"))
    }
    scaled.withColumn("_best", least(candidates: _*))
      .withColumn("cid", col("_best").getField("cid"))
      .withColumn("_score", -col("_best").getField("neg"))
      .drop("_best")
  }

  /** One Lloyd update: exact per-cluster integer sums + counts from the
    * current assignment. A cluster that lost every member keeps its
    * previous state (the standard empty-cluster rule, and the only choice
    * that is deterministic without a re-seeding heuristic). */
  private def kmeansUpdate(assigned: DataFrame,
                           prev: Array[CentroidState]): Array[CentroidState] = {
    val dim = prev.head.csum.length
    val rows = assigned
      .select(col("cid"), posexplode(col("ivec")).as(Seq("pos", "v")))
      .groupBy("cid", "pos").agg(sum("v").as("sv"), count(lit(1)).as("cnt"))
      .collect() // k·d rows — driver metadata by contract
    val sums = Array.fill(prev.length)(new Array[Long](dim))
    val counts = new Array[Long](prev.length)
    rows.foreach { r =>
      val cid = r.getLong(0).toInt
      sums(cid)(r.getInt(1)) = r.getLong(2)
      if (r.getInt(1) == 0) counts(cid) = r.getLong(3)
    }
    prev.indices.map { i =>
      if (counts(i) == 0) prev(i) else CentroidState(sums(i), counts(i))
    }.toArray
  }

  /** The shared Lloyd loop behind [[kmeansAssignments]] and
    * [[kmeansCentroids]] — ONE implementation so the two public surfaces
    * cannot drift. Every pass re-reads the quantized corpus (seeds +
    * k dots + update), so it is registry-tracked, released with the
    * engine's other loop caches. */
  private def kmeansTrainLoop(df: DataFrame, vecCol: String, keyCol: String,
                              k: Int, iters: Int, scale: Double,
                              dim: Int): (Array[CentroidState], DataFrame) = {
    require(k >= 2, "k-means needs k >= 2")
    require(iters >= 1, "at least one assignment pass")
    require(dim >= 1, "positive vector dimension")
    val scaled = graft.CacheRegistry.track(
      quantize(df, vecCol, keyCol, scale, dim))
    var cs = kmeansSeeds(scaled, k)
    var assigned = kmeansAssignOnce(scaled, cs)
    var pass = 1
    while (pass < iters) {
      cs = kmeansUpdate(assigned, cs)
      assigned = kmeansAssignOnce(scaled, cs)
      pass += 1
    }
    (cs, assigned)
  }

  /**
   * Train + assign: `iters` assignment passes with a Lloyd update between
   * consecutive passes (iters = 1 is pure seeded assignment). Returns
   * (key, ivec, cid) — the corpus routed onto trained coarse centroids.
   * `dim` is the declared vector dimension; rows of any other length are
   * excluded (see [[quantize]]).
   */
  def kmeansAssignments(df: DataFrame, vecCol: String, keyCol: String,
                        k: Int, iters: Int, dim: Int,
                        scale: Double = 1e6): DataFrame =
    kmeansTrainLoop(df, vecCol, keyCol, k, iters, scale, dim)._2.drop("_score")

  /**
   * Prototypicality pruning — "Beyond neural scaling laws" (Sorscher
   * 2022): in a big corpus the EASY (most prototypical) examples are the
   * redundant ones, so prune each semantic cluster down to its hardest
   * `keepRate` fraction. Rows route onto trained centroids (the exact-
   * integer Lloyd loop of [[kmeansAssignments]] — engine-exact
   * assignments), prototypicality = the assignment score itself
   * (dot(ivec, csum)/n, the row's mean inner product to its cluster), and
   * each cluster keeps its `ceil(keepRate · n_c)` LOWEST-scoring members
   * (ties to the lower key). Output: (cid, key) of the survivors.
   *
   * Determinism: the int64 dot is exact; the one division per row is a
   * fixed IEEE operation both engines evaluate identically (the a1/a2
   * oracle CTEs already pin this exact expression shape); ranking orders
   * (score ASC, key ASC) so ties cannot flip across engines.
   *
   * Scale shape: training is the audited Lloyd loop (scan-stage
   * assignment, one bounded (cid, pos) shuffle per pass); pruning adds
   * ONE window shuffle keyed by cid over (cid, key, score) triples — the
   * text/vector payload never moves. Cluster sizes are corpus/k-ish; a
   * skewed giant cluster makes that window the straggler, in which case
   * pre-aggregate per-cluster exact COUNTS (one map-side-combined agg)
   * and gate on an approximate per-cluster score quantile instead
   * ([[Sampling.calibratedQualityGate]]'s approx form) — same semantics,
   * sketch-bounded boundary.
   */
  def prototypePrune(df: DataFrame, vecCol: String, keyCol: String,
                     k: Int, iters: Int, dim: Int, keepRate: Double,
                     scale: Double = 1e6): DataFrame = {
    require(keepRate > 0.0 && keepRate < 1.0, "keepRate must be in (0, 1)")
    val assigned = kmeansTrainLoop(df, vecCol, keyCol, k, iters, scale, dim)._2
    val byHardness = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("_score").asc, col("key").asc)
    val cluster = org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
    assigned
      // explicit projection BEFORE the window: only (key, cid, score)
      // enters the per-cluster exchange — the vectors themselves must
      // never ride a corpus shuffle (ColumnPruning would likely drop
      // them anyway; at 10¹¹ rows "likely" isn't a plan contract)
      .select(col("key"), col("cid"), col("_score"))
      .withColumn("_rn", row_number().over(byHardness))
      .withColumn("_n", count(lit(1)).over(cluster))
      .filter(col("_rn") <= ceil(lit(keepRate) * col("_n")))
      .select(col("cid"), col("key"))
  }

  // =========================================================================
  // int8 scalar quantization — the 4× scan-bandwidth ANN path. At 100 TB
  // the embedding column dominates scan cost; per-vector symmetric int8
  // (q_i = round(x_i · 127 / max|x|), one double scale per vector) cuts
  // the bytes 4× while keeping the score arithmetic EXACT-integer inside:
  // dot(q_a, q_b) ≤ 127²·dim fits easily in int64, so the only floating
  // ops are the final two scale multiplications — a fixed expression
  // shape both engines evaluate identically (the oracle mirrors it).
  // =========================================================================

  /** (key, qvec int8[], scale double) — write this once
    * (`quantizeInt8(df,…).write.parquet(...)`) and ANN scans read a
    * quarter of the bytes. A zero vector quantizes to zeros with scale 0. */
  def quantizeInt8(df: DataFrame, vecCol: String, keyCol: String): DataFrame = {
    val maxabs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.filter(col(keyCol).isNotNull && col(vecCol).isNotNull)
      .withColumn("_m", maxabs)
      .select(col(keyCol).as("key"),
        transform(col(vecCol), x =>
          when(col("_m") === 0d, lit(0))
            .otherwise(round(x.cast("double") * 127.0 / col("_m")))
            .cast("tinyint")).as("qvec"),
        (col("_m") / 127.0).as("scale"))
  }

  /** round-half-away-from-zero — Math.round rounds half toward +∞, which
    * would disagree with SQL ROUND on negative ties. */
  private def roundHalfAway(x: Double): Long =
    (math.signum(x) * math.floor(math.abs(x) + 0.5)).toLong

  /** Approximate top-k over int8-quantized vectors: the query quantizes
    * with the SAME formula, the dot runs in exact int64, and the score is
    * `round(dot · rowScale · queryScale, 6)` — ordered AFTER rounding so
    * the ranking is engine-exact. */
  def int8TopK(df: DataFrame, vecCol: String, keyCol: String,
               query: Array[Float], k: Int): DataFrame = {
    val qmax = query.map(x => math.abs(x.toDouble)).max
    val qq: Array[Long] =
      if (qmax == 0d) Array.fill(query.length)(0L)
      else query.map(x => roundHalfAway(x.toDouble * 127.0 / qmax))
    val qscale = qmax / 127.0
    val qt = quantizeInt8(df.filter(size(col(vecCol)) === query.length),
      vecCol, keyCol)
    val dot = aggregate(
      zip_with(col("qvec"), array(qq.map(lit(_)): _*),
        (a, b) => a.cast("long") * b),
      lit(0L), (acc, v) => acc + v)
    qt.withColumn("score",
        round(dot.cast("double") * col("scale") * lit(qscale), 6))
      .orderBy(col("score").desc, col("key").asc)
      .limit(k)
      .select(col("key").as(keyCol), col("score"))
  }

  /** Trained coarse centroids as unit-normalized float vectors — drop-in
    * for the IVF probe/build paths in place of the seeded hyperplanes.
    * Note: `iters` assignment passes run, so the returned centroids are
    * the state AFTER the last update preceding the final pass — the same
    * state [[kmeansAssignments]] assigns against. */
  def kmeansCentroids(df: DataFrame, vecCol: String, keyCol: String,
                      k: Int, iters: Int, dim: Int,
                      scale: Double = 1e6): Array[Array[Float]] =
    kmeansTrainLoop(df, vecCol, keyCol, k, iters, scale, dim)._1.map { c =>
      val mean = c.csum.map(_.toDouble / (c.n * scale))
      val norm = math.sqrt(mean.map(m => m * m).sum).max(1e-12)
      mean.map(m => (m / norm).toFloat)
    }

  /**
   * IVF routing-quality diagnostic: mean recall@k of the routed probe vs
   * exact brute force, per nprobe setting — the measurement that chooses
   * nprobe BEFORE a 100 TB index serves traffic. `queries` is a bounded
   * sample relation (queryKeyCol must be unique); per nprobe the routed
   * candidates come from the same batch kernel the serving path uses
   * ([[ivfTopKBatchPrebuilt]]), truth from one batch brute-force pass
   * (queries broadcast onto a single corpus scan, per-query window
   * top-k). Output: (nprobe, mean_recall, n_queries) — a |nprobes|-row
   * frame. Corpus scans: 1 (truth) + |nprobes| routed partition-pruned
   * scans; nothing quadratic, nothing driver-side beyond the final rows.
   */
  def ivfRecallReport(spark: org.apache.spark.sql.SparkSession,
                      indexPath: String, queries: DataFrame,
                      queryKeyCol: String, queryVecCol: String,
                      vecCol: String, keyCol: String, k: Int, dim: Int,
                      nprobes: Seq[Int], nlist: Int = 16,
                      seed: Long = 7L): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(p => p >= 1 && p <= nlist),
      s"nprobes must be within [1, nlist=$nlist]")
    // ONE corpus scan serves the truth AND every nprobe: the brute-force
    // truth must score all (query, row) pairs anyway, and a routed probe's
    // candidate set is exactly "rows whose _list ranks within the query's
    // first np routing choices" — so score once, tag each pair with the
    // routing RANK of its list (position in the query's ranked max(np)
    // prefix, 0 = outside), and each probe is a filter + window over the
    // shared cached frame instead of its own partition-pruned scan+join
    // (the q_lsh_recall share-the-heavy-input fix applied to routing:
    // before, truth + each probe re-scanned; bytes were ~(1 + Σnp/nlist)×
    // the corpus, now 1×). Candidate sets are IDENTICAL by construction:
    // [[ivfTopKBatchPrebuilt]] derives probe lists from the same ranked
    // centroid array this prefix slices (equality unit-pinned).
    val maxNp = nprobes.max
    val dir = IndexLifecycle.resolveDir(spark, indexPath)
    val centroids = routingCentroids(spark, dir, nlist, dim, seed)
    val scoredC = array(centroids.indices.map { i =>
      struct(VF.cosine(col("_qv"), centroids(i)).as("s"), lit(i).as("i"))
    }: _*)
    val q = queries.filter(size(col(queryVecCol)) === dim)
      .select(col(queryKeyCol).as("_qid"), col(queryVecCol).as("_qv"))
      .withColumn("_qlists",
        transform(slice(udfFreeComparatorSort(scoredC), 1, maxNp), x => x("i")))
    val corpus = graft.Tables.artifact(spark, dir)
      .select(col(keyCol), col(vecCol), col("_list"))
    val scored = corpus.join(broadcast(q))
      .select(col("_qid"), col(keyCol),
        VF.dot(col(vecCol), col("_qv")).as("_s"),
        array_position(col("_qlists"), col("_list")).as("_prank"))
    // ONE window pass computes everything: the truth rank is a row_number
    // over (score desc, key asc), and a row's rank WITHIN the nprobe=np
    // probe (what [[ivfTopKBatchPrebuilt]]'s per-probe window would
    // assign) is the running count of prefix-rank<=np rows up to and
    // including itself over the SAME ordering — so each probe's top-k
    // membership is a per-row flag, recall is one conditional sum, and
    // the report is a single exchange + aggregate: no per-probe windows,
    // no semi-joins, no caches.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_qid")).orderBy(col("_s").desc, col(keyCol).asc)
    // the running count needs an explicit ROWS frame: the default RANGE
    // frame counts ORDER-BY PEERS together, and a duplicated key row (the
    // documented at-least-once residue of the raw append path) ties with
    // its twin on (_s, key) — RANGE would count both at both rows and
    // diverge from ivfTopKBatchPrebuilt's row_number at the k boundary
    val wRows = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val flagged = scored
      .withColumn("_rn_truth", row_number().over(w))
      .withColumns(nprobes.map { np =>
        s"_hit_$np" -> (col("_rn_truth") <= k &&
          col("_prank").between(1, np) &&
          sum(when(col("_prank").between(1, np), 1L).otherwise(0L))
            .over(wRows) <= k).cast("long")
      }.toMap)
    // micro-averaged recall: one division of two EXACT integers (total
    // hits / total truth rows), so the number is engine-deterministic —
    // a per-query double average would sum inexact x/k terms in
    // arbitrary order. Every query has exactly k truth rows when the
    // corpus has >= k rows, so micro == macro. n_queries counts distinct
    // qids in the scored cross — identical to |queries| against any
    // non-empty index (the only kind a recall report is meaningful on).
    val totals = flagged.agg(
      count_distinct(col("_qid")).as("_nq"),
      nprobes.map(np => sum(col(s"_hit_$np")).as(s"_h_$np")): _*)
    val probeCols = nprobes.flatMap { np =>
      Seq(lit(np), round(coalesce(col(s"_h_$np"), lit(0L)).cast("double") /
        (col("_nq") * k), 4), col("_nq"))
    }
    totals
      .select(probeCols.zipWithIndex.map { case (c, i) => c.as(s"_c$i") }: _*)
      .select(expr(s"stack(${nprobes.size}, " +
        probeCols.indices.map(i => s"_c$i").mkString(", ") +
        ") as (nprobe, mean_recall, n_queries)"))
  }

  // =========================================================================
  // Product quantization — the billion-vector ANN memory path (Jégou et
  // al. 2011, the FAISS IVF-ADC fine quantizer). The vector splits into m
  // subspaces; each subspace stores only a small code (argmin-L2 nearest
  // codebook entry), so a 64-dim float32 vector (256 B) becomes m=8 codes
  // (8 B) — a 32x scan-bandwidth cut on top of what int8 gives. Scoring is
  // ADC: the query precomputes one dot per (subspace, codebook entry), and
  // every row's score is m table lookups + a sum.
  //
  // Determinism discipline (the kmeans/int8 lesson): vectors and codebook
  // quantize to round(x·1e6) int64 ONCE; encode distances, LUT dots, and
  // the per-row score sum are all exact int64 (max |component| ~1e6 ⇒ a
  // subspace term ≤ 4e12, a score ≤ ~6e12 — comfortably < 2^53, so even
  // the final double cast is exact). Only the single trailing division by
  // scale² floats, and it is round(6)ed BEFORE ranking — the result is
  // bit-identical across engines and the oracle replays it relationally.
  // =========================================================================

  /** Data-sampled PQ codebook: the `ksub` rows smallest by
    * (md5(key), key) — the [[kmeansSeeds]] draw — quantized to int64.
    * Entry c of subspace s is row c sliced to [s·subDim, (s+1)·subDim).
    * Sampling the data itself (a standard kmeans init) keeps the codebook
    * ON the data manifold with zero training passes, is deterministic
    * across engines/cluster sizes, and — unlike trained constants — lets
    * the DuckDB oracle re-derive the codebook RELATIONALLY, so the whole
    * PQ path stays differentially checkable. A Lloyd refinement per
    * subspace ([[kmeansCentroids]] on sliced vectors) can replace this at
    * build time without touching encode/scan: the codebook is data, not
    * code. Returns ksub × dim (bounded: ksub rows collect). */
  def pqSampleCodebook(df: DataFrame, vecCol: String, keyCol: String,
                       ksub: Int, dim: Int,
                       scale: Double = 1e6): Array[Array[Long]] =
    quantize(df, vecCol, keyCol, scale, dim)
      .orderBy(md5(col("key").cast("string")), col("key")).limit(ksub)
      .select(col("ivec")).collect()
      .map(_.getSeq[Long](0).toArray)

  /** One L2 Lloyd assignment pass: argmin_c ‖x − round(mean_c)‖² — the
    * distance to each centroid's ROUNDED integer vector (half-away, the
    * same rounding the final codebook emission applies), computed as an
    * exact int64 sum of squared component deltas, ties to the lower cid.
    * Rounding the centroid BEFORE the distance (rather than scoring
    * against the exact rational mean) does two things at once: the
    * objective being reduced is the TRUE quantization distortion of the
    * integer codebook [[pqEncode]] will actually use, and every compared
    * quantity is an exact int64 — no float accumulation order anywhere —
    * so a SQL oracle replays training bit-exactly (the q_kmeans_train
    * discipline extended to the Euclidean objective). This is the
    * EUCLIDEAN objective PQ encoding minimizes — [[kmeansAssignOnce]]'s
    * mean-inner-product criterion optimizes a different (spherical)
    * objective and would not monotonically reduce PQ distortion. */
  private def l2AssignOnce(scaled: DataFrame,
                           cs: Array[CentroidState]): DataFrame = {
    val candidates = cs.zipWithIndex.map { case (c, i) =>
      val mc = c.csum.map(v => roundHalfAway(v.toDouble / c.n))
      val d = aggregate(
        zip_with(col("ivec"), array(mc.map(lit(_)): _*),
          (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
      struct(d.as("d"), lit(i.toLong).as("cid"))
    }
    scaled.withColumn("cid", least(candidates: _*).getField("cid"))
  }

  /** Lloyd-refined PQ codebook: per subspace, `iters` (assign → exact
    * integer update) cycles of Euclidean k-means over the quantized
    * subvectors, SEEDED by the same (md5, key) draw as
    * [[pqSampleCodebook]] — refinement provably starts AT the sampled
    * codebook and monotonically reduces the quantization distortion the
    * encoder minimizes (unit-pinned against the sampled baseline).
    * Returns the same ksub × dim int64 layout, so it drops into
    * [[pqEncode]] / [[pqBuildWith]] unchanged — the codebook is data, not
    * code. Per-subspace training cost: iters bounded (cid, pos)
    * aggregations over sd-wide vectors; the corpus never moves. */
  def pqTrainCodebook(df: DataFrame, vecCol: String, keyCol: String,
                      m: Int = 8, ksub: Int = 16, iters: Int = 2,
                      dim: Int = 64, scale: Double = 1e6): Array[Array[Long]] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(ksub >= 2 && iters >= 1, "ksub >= 2 and at least one Lloyd cycle")
    val sd = dim / m
    val per: Array[Array[Array[Long]]] = (0 until m).toArray.map { s =>
      val sub = df
        .filter(col(keyCol).isNotNull && col(vecCol).isNotNull &&
          size(col(vecCol)) === dim)
        .select(col(keyCol).as("key"), slice(col(vecCol), s * sd + 1, sd).as("subv"))
      val scaled = graft.CacheRegistry.track(
        quantize(sub, "subv", "key", scale, sd))
      var cs = kmeansSeeds(scaled, ksub)
      var pass = 0
      while (pass < iters) {
        cs = kmeansUpdate(l2AssignOnce(scaled, cs), cs)
        pass += 1
      }
      // integer mean, half-away rounding (the SQL ROUND convention)
      cs.map(c => c.csum.map(v => roundHalfAway(v.toDouble / c.n)))
    }
    Array.tabulate(ksub)(c => (0 until m).flatMap(s => per(s)(c)).toArray)
  }

  /** [[pqBuild]] with an EXPLICIT codebook — the consumer of
    * [[pqTrainCodebook]] (or any externally trained codebook): same
    * artifact layout, same probe paths.
    *
    * Lifecycle ([[IndexLifecycle]], the text-index scheme): codes and
    * codebook land under an immutable `outPath/v=N`, pointer flipped only
    * after BOTH tables are complete — a rebuild (e.g. retraining the
    * codebook on a drifted corpus) never tears a concurrent ADC probe,
    * and old versions stay probe-able until [[vacuumVectorIndex]]. */
  def pqBuildWith(df: DataFrame, vecCol: String, keyCol: String,
                  outPath: String, codebook: Array[Array[Long]], m: Int = 8,
                  dim: Int = 64, scale: Double = 1e6): Unit = {
    val spark = df.sparkSession
    val next = IndexLifecycle.nextVersion(spark, outPath)
    val vdir = s"$outPath/v=$next"
    pqEncode(df, vecCol, keyCol, codebook, m, dim, scale)
      .write.mode("overwrite").parquet(s"$vdir/codes")
    writeCodebook(spark, codebook, vdir)
    IndexLifecycle.flipPointer(spark, outPath, next)
  }

  /**
   * Extend a prebuilt PQ index with NEW rows, encoded with the index's own
   * FROZEN codebook — the maintenance half of the vector-index lifecycle
   * (the [[TermStats.appendTextIndex]] discipline): one append-mode write
   * of the batch's codes into the CURRENT version's codes table; the
   * existing artifact is neither read nor rewritten, so a daily crawl
   * keeps the serving index fresh without re-encoding the corpus. Keys
   * must be NEW; append == rebuild-with-the-same-codebook on probe
   * results is oracle-pinned (q_ann_pq_append). Single-writer: never
   * concurrent with a rebuild.
   *
   * Codebook drift: the frozen codebook was sampled/trained on the corpus
   * AS OF the build, so quantization error grows as appended data drifts
   * from that distribution. Measured on the sf0.001 fixture (near-uniform
   * random unit vectors — PQ's distortion worst case): recall@20 vs the
   * exact float ranking is 0.25 for the appended index vs 0.20 for a
   * fresh full rebuild — no drift penalty when the appended half is
   * i.i.d. with the build half (VectorIndexLifecycleSpec's drift check
   * re-measures this every run). A production pipeline should re-run the
   * recall gate ([[ivfRecallReport]]'s pattern) on the appended index
   * periodically and trigger a retraining rebuild when recall decays —
   * the rebuild is safe under a live reader by the CAS contract.
   */
  def appendPqIndex(batch: DataFrame, vecCol: String, keyCol: String,
                    indexPath: String, m: Int = 8, dim: Int = 64,
                    scale: Double = 1e6): Unit = {
    val dir = IndexLifecycle.resolveDir(batch.sparkSession, indexPath)
    pqAppendPlan(batch, vecCol, keyCol, dir, m, dim, scale)
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** [[appendPqIndex]] with EXACTLY-ONCE effect under micro-batch replay
    * ([[IndexLifecycle.appendOnce]] — a replayed raw append leaves
    * duplicate code rows: duplicated ADC hits crowd real neighbors out of
    * every top-k). Returns false on the replay no-op. `runId`:
    * restart-stable (checkpoint path / `query.id`). */
  def appendPqIndexOnce(batch: DataFrame, vecCol: String, keyCol: String,
                        indexPath: String, runId: String, batchId: Long,
                        m: Int = 8, dim: Int = 64,
                        scale: Double = 1e6): Boolean =
    // plan construction (codebook collect + m probe) stays inside the
    // callback: a no-op replay must run no Spark action
    IndexLifecycle.appendOnce(batch.sparkSession, indexPath, runId, batchId) {
      staging =>
        pqAppendPlan(batch, vecCol, keyCol,
            IndexLifecycle.resolveDir(batch.sparkSession, indexPath),
            m, dim, scale)
          .write.mode("overwrite").parquet(s"$staging/codes")
    }

  private def pqAppendPlan(batch: DataFrame, vecCol: String, keyCol: String,
                           dir: String, m: Int, dim: Int,
                           scale: Double): DataFrame = {
    val spark = batch.sparkSession
    val cb = readCodebook(spark, dir)
    requireMatchingM(spark, dir, m)
    pqEncode(requireAppendDim(batch, vecCol, dim), vecCol, keyCol,
      cb, m, dim, scale)
  }

  /** Refuse an append whose `m` disagrees with the index's build-time
    * subspace count (read off one existing codes row — works on any
    * version of the artifact, including legacy ones that predate any
    * build metadata): a shorter/longer code array would land silently in
    * the serving codes table and corrupt every subsequent ADC ranking —
    * the loud-refusal discipline of [[TermStats.appendTextIndex]]. An
    * empty codes table constrains nothing. */
  private def requireMatchingM(spark: org.apache.spark.sql.SparkSession,
                               dir: String, m: Int): Unit =
    spark.read.parquet(s"$dir/codes")
      .select(size(col("codes")).as("_m")).head(1).headOption
      .foreach { r =>
        require(r.getInt(0) == m,
          s"append m=$m does not match the index's build-time m=${r.getInt(0)} " +
            "— appended codes would corrupt ADC rankings; rebuild with " +
            "pqBuildWith/pqIvfBuild to change the code layout")
      }

  /** [[appendPqIndex]] for a ROUTED ([[pqIvfBuild]]) index: the batch
    * routes on the frozen `_centroids` AND encodes with the frozen
    * `_codebook`, appending into the right `_list=` partition
    * directories. Same contracts (new keys, single writer, drift note)
    * as the flat form. */
  def appendPqIvfIndex(batch: DataFrame, vecCol: String, keyCol: String,
                       indexPath: String, m: Int = 8, dim: Int = 64,
                       scale: Double = 1e6): Unit = {
    val dir = IndexLifecycle.resolveDir(batch.sparkSession, indexPath)
    pqIvfAppendPlan(batch, vecCol, keyCol, dir, m, dim, scale)
      .write.mode("append").partitionBy("_list").parquet(s"$dir/codes")
  }

  /** [[appendPqIvfIndex]] with EXACTLY-ONCE effect under micro-batch
    * replay ([[IndexLifecycle.appendOnce]] — the [[appendPqIndexOnce]]
    * rationale on the routed layout). Returns false on the replay no-op.
    * `runId`: restart-stable (checkpoint path / `query.id`). */
  def appendPqIvfIndexOnce(batch: DataFrame, vecCol: String, keyCol: String,
                           indexPath: String, runId: String, batchId: Long,
                           m: Int = 8, dim: Int = 64,
                           scale: Double = 1e6): Boolean =
    // plan construction (codebook + centroid collects) stays inside the
    // callback: a no-op replay must run no Spark action
    IndexLifecycle.appendOnce(batch.sparkSession, indexPath, runId, batchId) {
      staging =>
        pqIvfAppendPlan(batch, vecCol, keyCol,
            IndexLifecycle.resolveDir(batch.sparkSession, indexPath),
            m, dim, scale)
          .write.mode("overwrite").partitionBy("_list")
          .parquet(s"$staging/codes")
    }

  private def pqIvfAppendPlan(batch: DataFrame, vecCol: String,
                              keyCol: String, dir: String, m: Int, dim: Int,
                              scale: Double): DataFrame = {
    require(!batch.columns.contains("_list"),
      "input must not contain the reserved column _list")
    val spark = batch.sparkSession
    val cb = readCodebook(spark, dir)
    requireMatchingM(spark, dir, m)
    val cents = readCentroids(spark, dir)
    val assign = cents.indices.map { i =>
      struct(VF.cosine(col(vecCol), cents(i)).as("s"), lit(i).as("i"))
    }
    pqEncode(requireAppendDim(batch, vecCol, dim)
        .withColumn("_list", array_max(array(assign: _*))("i")),
      vecCol, keyCol, cb, m, dim, scale, keep = Seq("_list"))
  }

  /** Delete every non-current version of a PQ/IVF artifact (plus
    * crashed-flip pointer debris) — [[IndexLifecycle.vacuum]], exposed
    * under the vector-index name for symmetry with
    * [[TermStats.vacuumTextIndex]]. Only safe once no reader still holds
    * a pre-flip file list. */
  def vacuumVectorIndex(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String): Unit =
    IndexLifecycle.vacuum(spark, indexPath)

  /** Encode every row to its m subspace codes: per subspace the exact-int64
    * argmin-L2 codebook entry, ties to the lower code. Pure scan stage —
    * one fused codegen expression ([[graft.functions.PqEncodeExpr]]), no
    * shuffle, no UDF, no per-element lambda dispatch.
    * Output: (key, codes int[m], keep…) — write it once and ANN scans read
    * 32x fewer bytes than the float column. `keep` columns (e.g. a coarse
    * list id for [[pqIvfBuild]]) pass through unchanged. */
  def pqEncode(df: DataFrame, vecCol: String, keyCol: String,
               codebook: Array[Array[Long]], m: Int, dim: Int,
               scale: Double = 1e6, keep: Seq[String] = Nil): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(codebook.nonEmpty && codebook.forall(_.length == dim),
      "codebook rows must have the declared dimension")
    // reserved-output guard (the AsofJoin discipline): the select below
    // names its outputs "key"/"codes", so a passthrough of either would
    // silently duplicate a column name
    require(!keep.contains("key") && !keep.contains("codes"),
      "keep columns must not shadow the reserved outputs (key, codes)")
    // ONE codegen'd primitive loop (functions.PqEncodeExpr) — quantize and
    // all m argmins fused, no per-element lambda dispatch, and the
    // expression tree is O(1) in ksub so a real-world 256-entry codebook
    // cannot blow the codegen method limit (see the expression's scaladoc
    // for the measured HOF/unrolled alternatives it replaces)
    df.filter(col(keyCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) === dim)
      .select(col(keyCol).as("key") +:
        VF.pqEncode(col(vecCol), codebook, m, scale).as("codes") +:
        keep.map(col): _*)
  }

  /** ADC scan over a codes table: score = Σ_s LUT[s][code_s] where
    * LUT[s][c] = dot(query_sub_s, codebook[c]_sub_s) in exact int64; the
    * final score divides by scale² and round(6)s BEFORE ranking. The scan
    * touches ONLY the m-int codes column — the original vectors are never
    * read (the whole point at 100 TB). */
  def pqAdcTopK(codesDf: DataFrame, codesCol: String, keyCol: String,
                outKey: String, query: Array[Float], k: Int,
                codebook: Array[Array[Long]], m: Int, dim: Int,
                scale: Double = 1e6): DataFrame = {
    require(m >= 1 && dim % m == 0 && query.length == dim,
      "query dimension must match the codebook layout")
    val sd = dim / m
    val ksub = codebook.length
    val qi = query.map(x => roundHalfAway(x.toDouble * scale))
    val lut: Array[Long] = Array.tabulate(m * ksub) { i =>
      val s = i / ksub; val c = i % ksub
      var acc = 0L; var j = 0
      while (j < sd) { acc += qi(s * sd + j) * codebook(c)(s * sd + j); j += 1 }
      acc
    }
    val lutLit = array(lut.map(lit(_)): _*)
    val scoreInt = aggregate(
      zip_with(col(codesCol), sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(lutLit, s * ksub + c + 1)),
      lit(0L), (acc, v) => acc + v)
    // requireMatchingM's loud-refusal discipline, probe-side: a code row
    // whose length disagrees with the declared m would null-pad through
    // zip_with, null-poison the LUT sum, and return k ARBITRARY rows
    // with NULL scores — a wrong-m probe must fail, not degrade
    val codesChecked = when(size(col(codesCol)) === m, col(codesCol))
      .otherwise(raise_error(concat(
        lit("code row width "), size(col(codesCol)).cast("string"),
        lit(s" does not match the declared m=$m — wrong (m, dim) for " +
          "this index"))))
    codesDf
      .withColumn(codesCol, codesChecked)
      .withColumn("score",
        round(scoreInt.cast("double") / lit(scale * scale), 6))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol).as(outKey), col("score"))
  }

  /** In-query PQ top-k: sample codebook (bounded ksub-row collect), encode
    * and ADC-score in ONE plan. The differential-testing form — the 100 TB
    * form is [[pqBuild]] + [[pqTopKPrebuilt]], same results by
    * construction. */
  def pqTopK(df: DataFrame, vecCol: String, keyCol: String,
             query: Array[Float], k: Int, m: Int = 8, ksub: Int = 16,
             dim: Int = 64, scale: Double = 1e6): DataFrame = {
    val cb = pqSampleCodebook(df, vecCol, keyCol, ksub, dim, scale)
    pqAdcTopK(pqEncode(df, vecCol, keyCol, cb, m, dim, scale),
      "codes", "key", keyCol, query, k, cb, m, dim, scale)
  }

  /** Materialize the PQ index: one parquet with the codes table (key,
    * codes int[m]) plus the codebook itself under `_codebook` (code id →
    * int64 row) — the artifact carries everything a scan needs, so the
    * probe side never re-reads the raw vectors. Lands as the next CAS
    * version ([[pqBuildWith]]'s lifecycle). */
  def pqBuild(df: DataFrame, vecCol: String, keyCol: String, outPath: String,
              m: Int = 8, ksub: Int = 16, dim: Int = 64,
              scale: Double = 1e6): Array[Array[Long]] = {
    val cb = pqSampleCodebook(df, vecCol, keyCol, ksub, dim, scale)
    pqBuildWith(df, vecCol, keyCol, outPath, cb, m, dim, scale)
    cb
  }

  /** The codebook rides inside the version directory so a probe needs no
    * out-of-band state — ksub rows of (code id, int64 row). */
  private def writeCodebook(spark: org.apache.spark.sql.SparkSession,
                            cb: Array[Array[Long]], outPath: String): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cb.zipWithIndex.map { case (row, c) =>
        org.apache.spark.sql.Row(c, row.toSeq)
      }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("row",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = false))))
      .write.mode("overwrite").parquet(s"$outPath/_codebook")
  }

  /** IVF-ADC: the routed PQ index (FAISS IVFPQ, no-residual form — codes
    * quantize the RAW vectors, so one codes table serves both the flat
    * ADC scan and the routed one; residual encoding would buy precision
    * at the cost of per-list codebooks, a codebook-data change this API
    * already permits). ONE build pass computes the coarse list id (the
    * [[ivfBuildWith]] assignment over seeded centroids) AND the PQ codes,
    * written partitioned by `_list`. */
  def pqIvfBuild(df: DataFrame, vecCol: String, keyCol: String,
                 outPath: String, m: Int = 8, ksub: Int = 16, dim: Int = 64,
                 nlist: Int = 16, seed: Long = 7L,
                 scale: Double = 1e6): Array[Array[Long]] = {
    require(!df.columns.contains("_list"),
      "input must not contain the reserved column _list")
    val spark = df.sparkSession
    val next = IndexLifecycle.nextVersion(spark, outPath)
    val vdir = s"$outPath/v=$next"
    val cb = pqSampleCodebook(df, vecCol, keyCol, ksub, dim, scale)
    val cents = ivfCentroids(nlist, dim, seed)
    val assign = cents.indices.map { i =>
      struct(VF.cosine(col(vecCol), cents(i)).as("s"), lit(i).as("i"))
    }
    pqEncode(df.withColumn("_list", array_max(array(assign: _*))("i")),
        vecCol, keyCol, cb, m, dim, scale, keep = Seq("_list"))
      .write.mode("overwrite").partitionBy("_list")
      .parquet(s"$vdir/codes")
    writeCodebook(spark, cb, vdir)
    writeCentroids(spark, cents, vdir)
    IndexLifecycle.flipPointer(spark, outPath, next)
    cb
  }

  /** Two-stage retrieval (the standard serving pattern over a compressed
    * index): stage 1 ADC-scans the codes table for a shortlist of
    * `k · rerank` candidates — compressed-scan cost over the whole index;
    * stage 2 fetches ONLY those candidates' raw vectors (a keys-only
    * semi-join driven by the shortlist, i.e. a bounded point-read at
    * cluster scale, ideally against a key-sorted/z-ordered layout) and
    * re-ranks them with the exact float cosine. Result: exact top-k
    * precision for the price of a compressed scan + k·rerank row fetches.
    * Ranking determinism: both stages round before ordering and tie-break
    * on the key. */
  def pqRerankTopK(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String, raw: DataFrame, vecCol: String,
                   keyCol: String, outKey: String, query: Array[Float],
                   k: Int, rerank: Int = 5, m: Int = 8, dim: Int = 64,
                   scale: Double = 1e6): DataFrame = {
    require(rerank >= 1, "rerank factor must be >= 1")
    val shortlist = pqTopKPrebuilt(spark, indexPath, outKey, query,
        k * rerank, m, dim, scale)
      .select(col(outKey))
    raw.join(shortlist, raw(keyCol) === shortlist(outKey), "left_semi")
      .filter(size(col(vecCol)) === dim)
      .withColumn("score", round(VF.cosine(col(vecCol), query), 6))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol).as(outKey), col("score"))
  }

  /** The compound 100 TB probe: route to nprobe/nlist partitions
    * (partition-pruned — most files never open), ADC-score only the m-int
    * codes inside them. Scan bytes vs the flat float column ≈
    * (nprobe/nlist) · (m·4)/(dim·4) — the two reductions MULTIPLY (4/16
    * lists × 32x code compression = 1/128 of the bytes at the defaults). */
  def pqIvfTopK(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                outKey: String, query: Array[Float], k: Int,
                m: Int = 8, dim: Int = 64, nlist: Int = 16, nprobe: Int = 4,
                seed: Long = 7L, scale: Double = 1e6): DataFrame = {
    // resolve the pointer ONCE: probe and codebook read one consistent
    // version even if a rebuild flips the pointer mid-query
    val dir = IndexLifecycle.resolveDir(spark, indexPath)
    val probed = probedLists(
      routingCentroids(spark, dir, nlist, dim, seed), query, nprobe)
    pqAdcTopK(
      graft.Tables.artifact(spark, s"$dir/codes")
        .filter(col("_list").isin(probed: _*)),
      "codes", "key", outKey, query, k, readCodebook(spark, dir),
      m, dim, scale)
  }

  /** Bounded ksub-row collect — the documented codebook contract;
    * memoized per version dir (the [[readCentroids]] rationale: frozen
    * within a version, a new version is a new key). */
  private def readCodebook(spark: org.apache.spark.sql.SparkSession,
                           vdir: String): Array[Array[Long]] =
    memoized(s"codebook|$vdir|" +
        tableFingerprint(spark, s"$vdir/_codebook")) {
      spark.read.parquet(s"$vdir/_codebook")
        .orderBy(col("c")).collect()
        .map(_.getSeq[Long](1).toArray)
    }

  /** The steady-state PQ probe: read the codebook (ksub rows), ADC-scan
    * the codes table. Scan bytes = m ints per row — the raw embedding
    * column is not in the plan at all (ReadSchema pins it). */
  def pqTopKPrebuilt(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String, outKey: String, query: Array[Float],
                     k: Int, m: Int = 8, dim: Int = 64,
                     scale: Double = 1e6): DataFrame = {
    val dir = IndexLifecycle.resolveDir(spark, indexPath)
    pqAdcTopK(graft.Tables.artifact(spark, s"$dir/codes"), "codes", "key",
      outKey, query, k, readCodebook(spark, dir), m, dim, scale)
  }

  /**
   * Batch ADC over a prebuilt PQ index: top-k for EVERY query row in one
   * plan — [[ivfTopKBatchPrebuilt]]'s pattern applied to the compressed
   * codes, so a batch of stored queries serves against m ints per corpus
   * row with the raw vectors absent from the plan. Scores are identical
   * to [[pqTopKPrebuilt]] per query (unit-pinned): the per-query LUT is
   * derived RELATIONALLY — queries quantize to round(x·scale) int64 in
   * the plan, each (subspace, code) cell is an exact-int64 dot against
   * the frozen codebook — so the whole batch stays oracle-checkable.
   *
   * Scale shape: the LUT relation is |queries|·m·ksub rows (bounded by
   * the query batch — model-sized by contract) and BROADCASTS onto the
   * codes scan exploded to (key, subspace, code) triples; map-side
   * partial aggregation collapses each task to (qid, key) partials before
   * the one shuffle, whose volume is |queries|·|corpus| int64 pairs — the
   * irreducible output of unrouted batch scoring (route first via
   * [[pqIvfBuild]] + a `_list` filter when the batch is large). Ranking
   * is one window per query key; `queryKeyCol` must be unique per row.
   */
  def pqTopKBatchPrebuilt(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, queries: DataFrame,
                          queryKeyCol: String, queryVecCol: String,
                          outKey: String, k: Int, m: Int = 8, dim: Int = 64,
                          scale: Double = 1e6,
                          rankCol: Option[String] = None): DataFrame = {
    val scored = pqScoredBatchPrebuilt(spark, indexPath, queries,
      queryKeyCol, queryVecCol, m, dim, scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_qid")).orderBy(col("score").desc, col("key").asc)
    // rankCol: the ranked handoff for rrfFuseBatchRanked (see the BM25
    // batch kernel's note) — same rank the fuse would recompute
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(Seq(col("_qid").as(queryKeyCol), col("key").as(outKey),
        col("score")) ++ rankCol.map(rc => col("_rn").as(rc)): _*)
  }

  /** Scored (query, doc) ADC candidates for a batch of queries — the
    * frame [[pqTopKBatchPrebuilt]] cuts its per-query top-k from, exposed
    * package-private so [[TermStats.hybridRrfBatchPrebuilt]] can rank
    * both retrieval kernels inside ONE window exchange. Columns:
    * (_qid, key, score). */
  private[operators] def pqScoredBatchPrebuilt(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame,
      queryKeyCol: String, queryVecCol: String,
      m: Int = 8, dim: Int = 64, scale: Double = 1e6): DataFrame = {
    val dir = IndexLifecycle.resolveDir(spark, indexPath)
    require(m >= 1 && dim % m == 0,
      s"dim $dim must divide into m=$m subspaces")
    val sd = dim / m
    // codebook subvectors as a RELATIONAL (s, c, cv) frame — the ksub-row
    // _codebook table exploded to m·ksub rows in the plan, not a driver
    // collect: the serving probe then has NO eager construction-time
    // action at all; the codebook read rides the luts broadcast future
    // inside the one main job (the TermStats.dfreqFor discipline). A row
    // whose width disagrees with the declared dim raises IN the plan
    // (raise_error is non-foldable, so the guard survives optimization) —
    // the loud-refusal discipline of the requireMatchingM append guard;
    // silently dropping mismatched rows would serve an EMPTY vector
    // ranking and a hybrid pipeline would degrade to BM25-only unnoticed.
    val rowChecked = when(size(col("row")) === dim, col("row"))
      .otherwise(raise_error(concat(
        lit("codebook row width "), size(col("row")).cast("string"),
        lit(s" does not match the declared dim=$dim — wrong (m, dim) for " +
          "this index"))))
    val cbDf = graft.Tables.artifact(spark, s"$dir/_codebook")
      .select(col("c").as("_c"),
        explode(transform(sequence(lit(0), lit(m - 1)),
          s => struct(s.as("s"),
            slice(rowChecked, s * sd + 1, lit(sd)).as("cv")))).as("_e"))
      .select(col("_e.s").as("_s"), col("_c"), col("_e.cv").as("_cv"))
    val qis = queries.filter(size(col(queryVecCol)) === dim)
      .select(col(queryKeyCol).as("_qid"),
        transform(col(queryVecCol),
          x => round(x.cast("double") * scale).cast("long")).as("_qv"))
    val luts = qis.crossJoin(cbDf)
      .select(col("_qid"), col("_s"), col("_c"),
        aggregate(
          zip_with(
            slice(col("_qv"), col("_s") * lit(sd) + lit(1), lit(sd)),
            col("_cv"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v).as("_l"))
    // Per-query LUT ARRAYS + a scan-stage fold, not posexplode + join +
    // hash-agg: exploding the codes m-ways and re-aggregating per
    // (query, key) pushed m·|codes|·|q| rows through a join and a hash
    // aggregate to compute what is per row just m array lookups. The
    // (s, c)-sorted collect puts entry (s, c) at position s·ksub + c + 1
    // BY ORDER (no ksub constant needed to build it — the construction
    // stays action-free), and ksub is recovered at fold time as
    // size(lut)/m. Scores are the identical integer sums (pinned by the
    // batch == single probe test).
    val lutArr = luts
      .groupBy(col("_qid"))
      .agg(array_sort(collect_list(struct(
        col("_s"), col("_c"), col("_l")))).as("_sl"))
      .select(col("_qid"), transform(col("_sl"), x => x("_l")).as("_lut"))
    val ksubCol = size(col("_lut")) / m
    val scoreInt = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(col("_lut"), (s * ksubCol + c + 1).cast("int"))),
      lit(0L), (acc, v) => acc + v)
    // pqAdcTopK's loud-refusal guard, batch side: a silent width filter
    // here would drop EVERY code row under a wrong-m probe (the codebook
    // dim check passes when m differs but dim matches), and
    // hybridRrfBatchPrebuilt would degrade to BM25-only unnoticed
    val codesChecked = when(size(col("codes")) === m, col("codes"))
      .otherwise(raise_error(concat(
        lit("code row width "), size(col("codes")).cast("string"),
        lit(s" does not match the declared m=$m — wrong (m, dim) for " +
          "this index"))))
    graft.Tables.artifact(spark, s"$dir/codes")
      .withColumn("codes", codesChecked)
      .crossJoin(broadcast(lutArr))
      .select(col("_qid"), col("key"),
        round(scoreInt.cast("double") / lit(scale * scale), 6).as("score"))
  }
}
