package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Duplicate-cluster resolution: near-dup detection (MinHash/SimHash/
 * embedding LSH) yields PAIRS, but a curation pipeline must keep one
 * canonical document per duplicate CLUSTER — pairs (a,b),(b,c) are one
 * cluster {a,b,c} even though (a,c) was never emitted. That closure is
 * connected components over the pair graph.
 *
 * Algorithm: min-label propagation WITH pointer jumping — each round
 * every node adopts the minimum label among itself and its neighbors
 * (propagation), then adopts its label's own label (path compression, the
 * pointer-doubling step of parallel union-find). Propagation alone
 * converges in DIAMETER rounds — fine for dense LSH cliques (2-4 hops),
 * but chain-shaped graphs (embedding buckets linked by multi-probe) have
 * long diameters; the jump step halves remaining chain length per round,
 * so convergence is O(log diameter) on any shape. The component label is
 * the smallest key in the component (deterministic canonical winner, same
 * convention as [[Dedup.exact]]).
 *
 * Scale shape: each round is two node-key joins + one min aggregation —
 * all shuffles on the node key, nothing quadratic, label table has one
 * row per node appearing in any pair (orders of magnitude smaller than
 * the corpus). The per-round convergence check is one count() on the
 * already-materialized round output.
 */
object Clustering {

  /**
   * Connected components over an undirected pair list. Returns one row
   * per distinct node: (node under `outKey`, `cluster` = min key in its
   * component). Nodes absent from `pairs` are absent from the output (a
   * doc with no near-dup is its own trivial cluster — callers left-join
   * and coalesce to itself).
   *
   * `checkpointDir`: None (default) cuts lineage with localCheckpoint —
   * fastest, but blocks die with their executor, so a mid-algorithm
   * executor loss reruns the job. On a long cluster job pass a reliable
   * directory (HDFS/object store): each round then checkpoints to
   * storage that survives executor loss, with each round persisted
   * before the write (so the reliable write re-reads the cache instead
   * of recomputing the round) and SUPERSEDED rounds' files deleted as
   * the algorithm advances — only the files backing the RETURNED frame
   * remain, and they are read on every downstream action, so the caller
   * cleans the directory after consuming (or persisting) the result.
   * Sets the context-global checkpoint dir if one isn't already set; if
   * a DIFFERENT one is set, files land there and a warning is logged
   * (the context dir is global — this call cannot move it safely).
   *
   * If min-label propagation + pointer jumping hasn't converged after
   * `maxIter` rounds (component diameter too large for the budget), the
   * algorithm does NOT fail: it contracts each partial cluster to its
   * label (a star contraction — the quotient graph is strictly smaller
   * whenever any merge happened) and recurses on the quotient, composing
   * the labels on the way back. Effective budget multiplies per level,
   * and each level's quotient shrinks geometrically under jumping, so
   * any diameter converges.
   *
   * Size-tiered execution (the [[KeyProbe]] regime discipline): the edge
   * list is materialized ONCE either way, so counting it is a cheap
   * block scan — at or below `driverThreshold` edges the components
   * resolve with driver-side union-find (micro-seconds versus ~8 Spark
   * jobs per distributed round; the collect is bounded by the threshold
   * at ~60 bytes/edge of transient driver heap for long keys — see the
   * sizing note at the collect site), above it the iterative distributed
   * kernel runs.
   * Both paths produce identical (node, min-key cluster) labels — a
   * property test pins the equivalence.
   */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          outKey: String = "key", maxIter: Int = 20,
                          checkpointDir: Option[String] = None,
                          driverThreshold: Long = 500000L): DataFrame = {
    require(maxIter >= 1, "maxIter must be >= 1")
    // fail fast, not at the first downstream reference: the output schema
    // is (outKey, "cluster"), so outKey = "cluster" (case-insensitively —
    // Spark resolves names case-insensitively) would emit two same-named
    // columns and every consumer's col("cluster") dies AMBIGUOUS_REFERENCE
    // (the Snapshots._mc_rn guard discipline)
    require(!outKey.equalsIgnoreCase("cluster"),
      "outKey must not be 'cluster' — the second output column carries " +
        "the cluster label under that name")
    // localCheckpoint (eager), not cache: an iterative algorithm must
    // CUT the logical plan each round, not just memoize results. A
    // cached frame still carries its full lineage, so every iteration's
    // plan would embed the whole pair-generation tree (LSH banding is a
    // BIG plan) several times over — plan size grows geometrically with
    // iterations and the driver dies rendering/optimizing plans long
    // before any executor breaks a sweat (observed: heap exhaustion
    // inside explainString at ~1700 pairs). Checkpointed frames restart
    // the lineage at the materialized blocks, so every round's plan is
    // O(1). localCheckpoint block lifecycle: superseded rounds are freed
    // by the ContextCleaner once the driver references are gone (standard
    // RDD lifecycle; Bench forces a GC between queries). RELIABLE
    // checkpoint files are NOT cleaned by the ContextCleaner — this code
    // deletes superseded rounds explicitly (see deleteFiles below).
    // dropLineageAndStats after each cut: Spark 4 checkpoints PRESERVE the
    // origin plan's sizeInBytes, so without the strip a loop of self-joins
    // multiplies the estimate per round — BigInt bits compound ~6x per
    // generation and the optimizer's stats visitor drowns in million-digit
    // multiplication long before any executor works (the same driver-side
    // failure class as the lineage blowup this checkpoint exists to stop).
    val session = pairs.sparkSession
    val hadoopConf = session.sparkContext.hadoopConfiguration
    def deleteFiles(paths: Seq[String]): Unit = paths.foreach { p =>
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(hadoopConf).delete(hp, true)
      } catch { case scala.util.control.NonFatal(_) => () } // cleanup is best-effort
    }
    // cut lineage+stats; returns the re-rooted frame plus the reliable
    // checkpoint directory backing it (None on the localCheckpoint path)
    val ckpt2: DataFrame => (DataFrame, Seq[String]) = checkpointDir match {
      case Some(dir) =>
        val sc = session.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        else {
          // setCheckpointDir stores <dir>/<uuid>, so comparing the stored
          // value to the requested dir directly can NEVER match — compare
          // the stored path's PARENT (both sides fully qualified) so the
          // warning fires only when files genuinely land elsewhere
          // best-effort like deleteFiles above: resolving a FileSystem can
          // throw (unknown scheme, malformed path) and a diagnostic whose
          // only job is to warn that the requested dir is ignored must
          // never kill the clustering job itself
          val sameParent = try {
            val current = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
            val requested = new org.apache.hadoop.fs.Path(dir)
            current.getParent != null &&
              current.getParent.getFileSystem(hadoopConf).makeQualified(current.getParent) ==
                requested.getFileSystem(hadoopConf).makeQualified(requested)
          } catch { case scala.util.control.NonFatal(_) => false }
          if (!sameParent)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"connectedComponents: context checkpoint dir ${sc.getCheckpointDir.get} " +
                s"already set — requested $dir is ignored (the setting is context-global)")
        }
        df => {
          // persist first: eager checkpoint runs a count job AND a file-write
          // job — without the cache the round's joins execute twice. The
          // unpersist must also run when checkpoint() THROWS (checkpoint FS
          // full, job aborted): a caller that catches and retries would
          // otherwise accumulate one pinned round-sized cache per failure
          val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val ck =
            try cached.checkpoint()
            finally cached.unpersist(blocking = false)
          val files = ck.queryExecution.analyzed.collect {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }.flatMap(_.getCheckpointFile)
          (org.apache.spark.sql.GraftBridge.dropLineageAndStats(ck), files)
        }
      case None => df =>
        (org.apache.spark.sql.GraftBridge.dropLineageAndStats(df.localCheckpoint()), Nil)
    }
    // null-keyed pairs are stripped up front (the KeyProbe null discipline):
    // a null node can't label anything or join back to a corpus key, and
    // stripping here keeps the two regimes' outputs identical
    val cleanPairs = pairs.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val (edges, edgeFiles) = ckpt2(cleanPairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(cleanPairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct())

    // regime probe FUSED with the driver collect: ONE job over the just-
    // materialized blocks returns per-partition (directed count, bounded
    // u <= v sample) — r18, replacing the count() job + collect() job pair
    // (the quartet's per-call scheduling floor; at cluster scale, one
    // fewer scheduling round-trip per clustering call). Decision math is
    // unchanged: divide the COUNT instead of doubling the threshold
    // (driverThreshold * 2 overflows Long for an "always driver"
    // Long.MaxValue caller). Edges carry both directions, hence the / 2.
    //
    // The sample keeps ONE orientation only (u <= v in Catalyst, so string
    // keys compare in UTF8String BYTE order exactly like the distributed
    // kernel's min — the non-BMP regression test): self-loops (isolated
    // nodes) and one copy of every undirected edge; every node still
    // appears on some side. Tuples, not Rows: ~60 bytes/edge boxed longs,
    // ~60 MB transient driver heap at the 500K default (see
    // driverUnionFind). The per-partition cap makes the fused collect
    // SAFE in the distributed regime, where the old count-first probe
    // shipped nothing: a partition stops buffering at cap, so the
    // driver's worst-case transient is partitions * cap ~= 4x threshold
    // edges, not the whole graph. Distinct() hash-partitions edges
    // near-uniformly, so a DRIVER-regime graph (<= threshold undirected
    // rows in total) overflows a 4x-mean cap only under adversarial
    // hash skew — and that overflow falls back to the distributed
    // kernel, which computes the identical labels (regime equivalence is
    // property-pinned), never to a wrong answer.
    val nParts = math.max(1, edges.rdd.getNumPartitions)
    val cap: Int =
      if (driverThreshold >= Int.MaxValue.toLong * nParts / 4) Int.MaxValue
      else math.max(1024L, 4L * driverThreshold / nParts).toInt
    val perPart = edges
      .select(col("u"), col("v"), (col("u") <= col("v")).as("_keep"))
      .rdd.mapPartitions { it =>
        var directed = 0L
        var overflow = false
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Any, Any)]
        it.foreach { r =>
          directed += 1L
          if (r.getBoolean(2)) {
            if (buf.length < cap) buf += ((r.get(0), r.get(1)))
            else overflow = true
          }
        }
        Iterator.single((directed, buf.toArray, overflow))
      }.collect()
    val directedTotal = perPart.iterator.map(_._1).sum
    if (directedTotal / 2 <= driverThreshold && !perPart.exists(_._3)) {
      val keyType = pairs.schema(aCol).dataType
      val tuples = perPart.flatMap(_._2)
      val result = driverUnionFind(tuples, session, keyType, outKey)
      deleteFiles(edgeFiles)
      return result
    }

    val (labels0, labels0Files) = ckpt2(edges.select(col("u")).distinct()
      .withColumn("label", col("u")))
    var labels = labels0
    // files backing the CURRENT labels frame — everything else this call
    // created is superseded the moment a new round materializes
    var liveFiles: Seq[String] = labels0Files
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // propagation: each node adopts min(own label, neighbors' labels).
      // The checkpoint materializes prop ONCE — the pointer-jump
      // self-join below reads its blocks twice instead of running the
      // join+agg subtree twice.
      val neighborMin = edges
        .join(labels.select(col("u").as("v"), col("label").as("vlabel")), Seq("v"))
        .groupBy(col("u")).agg(min(col("vlabel")).as("nmin"))
      val (prop, propFiles) = ckpt2(labels.withColumnRenamed("label", "_old")
        .join(neighborMin, Seq("u"), "left_outer")
        .select(col("u"), col("_old"),
          least(col("_old"), coalesce(col("nmin"), col("_old"))).as("_mid")))
      // pointer jump: adopt the label's own label (labels are node keys,
      // so every label value has a row). Halves remaining chain length.
      val (jumped, jumpedFiles) = ckpt2(prop
        .join(prop.select(col("u").as("_mid"), col("_mid").as("_ll")),
          Seq("_mid"), "left_outer")
        .select(col("u"), col("_old"),
          least(col("_mid"), coalesce(col("_ll"), col("_mid"))).as("label")))
      val changed = jumped.filter(col("label") < col("_old")).count()
      // jumped is durably materialized: the round's prop and the previous
      // labels are superseded — delete their reliable files now so a long
      // job's checkpoint footprint stays O(1) rounds, not O(iterations)
      deleteFiles(propFiles ++ liveFiles)
      liveFiles = jumpedFiles
      labels = jumped.select(col("u"), col("label"))
      converged = changed == 0
      iter += 1
    }
    if (!converged) {
      // star-contraction fallback: every partial cluster contracts to its
      // current label; cross-label edges form the quotient graph, which is
      // strictly smaller than the node set (round 1 merged at least every
      // adjacent (min, neighbor) pair), so the recursion terminates. Final
      // label = the quotient component's label of the node's own label.
      val (quotient, quotientFiles) = ckpt2(edges
        .join(labels.select(col("u"), col("label").as("_lu")), Seq("u"))
        .join(labels.select(col("u").as("v"), col("label").as("_lv")), Seq("v"))
        .filter(col("_lu") =!= col("_lv"))
        .select(col("_lu"), col("_lv")).distinct())
      val sub = connectedComponents(quotient, "_lu", "_lv",
        outKey = "_qlabel", maxIter = maxIter, checkpointDir = checkpointDir,
        driverThreshold = driverThreshold)
      // the recursion consumed the quotient eagerly (its own edges are
      // checkpointed) and cleans its own intermediates; only its final
      // frame's files — referenced by `sub` below — survive it
      deleteFiles(quotientFiles)
      labels = labels
        .join(sub.withColumnRenamed("_qlabel", "label"), Seq("label"), "left_outer")
        .select(col("u"), coalesce(col("cluster"), col("label")).as("label"))
    }
    // the returned frame reads liveFiles (and the recursion's finals) on
    // every action — everything else this call wrote is gone already
    deleteFiles(edgeFiles)
    labels.select(col("u").as(outKey), col("label").as("cluster"))
  }

  /** Driver-side regime for bounded graphs: classic union-find with
    * iterative path compression over the collected edge list, labels =
    * the MIN member key per component (the same canonical-winner
    * convention as the distributed kernel — a property test holds the
    * two regimes equal). Input tuples are ONE orientation (u <= v) of the
    * undirected edge set, self-loops included for isolated nodes; the
    * key type must be Comparable (Long/String/etc., which is every key
    * type the engine produces). */
  private def driverUnionFind(edges: Array[(Any, Any)],
                              session: org.apache.spark.sql.SparkSession,
                              keyType: org.apache.spark.sql.types.DataType,
                              outKey: String): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      parent.getOrElseUpdate(x, x)
      var root = x
      while (parent(root) != root) root = parent(root)
      var cur = x // compress the walked path
      while (parent(cur) != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    edges.foreach { case (u, v) =>
      val ra = find(u); val rb = find(v)
      if (ra != rb) parent(ra) = rb
    }
    // min-label ordering MUST match the distributed kernel's min()/least(),
    // which for strings is UTF8String compare = unsigned UTF-8 BYTE order.
    // Java String.compareTo is UTF-16 code-unit order — the two disagree
    // when supplementary-plane keys (emoji, U+10000+) mix with
    // U+E000..U+FFFF keys (surrogates 0xD800-0xDFFF sort below 0xE000 in
    // UTF-16 but their UTF-8 bytes 0xF0+ sort above 0xEE-0xEF), so the two
    // regimes could elect DIFFERENT canonical labels for one cluster
    val lt: (Any, Any) => Boolean = keyType match {
      case org.apache.spark.sql.types.StringType => (a, b) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a.asInstanceOf[String])
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.asInstanceOf[String])) < 0
      case _ => (a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
    val keys = parent.keys.toArray
    keys.foreach { k =>
      val r = find(k)
      if (!minOf.contains(r) || lt(k, minOf(r))) minOf(r) = k
    }
    val rows = keys.toSeq.map(k => org.apache.spark.sql.Row(k, minOf(find(k))))
    session.createDataFrame(session.sparkContext.parallelize(rows),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(outKey, keyType),
        org.apache.spark.sql.types.StructField("cluster", keyType))))
  }

  /** Canonical-per-cluster view: one surviving key per duplicate cluster
    * (the minimum — the cluster label itself). */
  def clusterWinners(components: DataFrame, keyCol: String): DataFrame =
    components.filter(col(keyCol) === col("cluster")).select(col(keyCol))

  /**
   * The full near-dup dedup: drop every NON-canonical cluster member from
   * `docs`, keep canonical winners and all unclustered docs — the
   * pairs → components → corpus composition a curation pipeline actually
   * ships.
   *
   * The loser anti-join is deliberately UN-hinted: the loser set is one
   * key per non-canonical duplicate, i.e. proportional to the corpus's
   * duplicate RATE — a web-scale crawl dedups away 30-50% of its
   * documents, which is billions of keys, not a broadcastable dimension
   * table. A forced broadcast here is a driver/executor OOM cliff at
   * exactly the scale this operator exists for (the same cliff
   * [[Dedup.containmentPairs]] refuses for its hot-shingle set). A plain
   * shuffled left_anti on the key column is bounded, and AQE still
   * converts it to a broadcast join at runtime whenever the loser set
   * actually measures small — the hint only removed the safety net.
   */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame,
                         aCol: String, bCol: String, keyCol: String,
                         maxIter: Int = 20,
                         checkpointDir: Option[String] = None,
                         driverThreshold: Long = 500000L): DataFrame = {
    // the clustering knobs pass through: a web-scale run through this
    // wrapper needs the reliable-checkpoint path and a tuned iteration
    // budget just as much as a direct connectedComponents caller does
    val comps = connectedComponents(pairs, aCol, bCol, outKey = keyCol,
      maxIter = maxIter, checkpointDir = checkpointDir,
      driverThreshold = driverThreshold)
    val losers = comps.filter(col(keyCol) =!= col("cluster")).select(col(keyCol))
    docs.join(losers, Seq(keyCol), "left_anti")
  }

  /**
   * Policy-aware canonical selection: like [[dropNearDuplicates]], but the
   * survivor of each duplicate cluster is chosen by `priority` (highest
   * wins; ties break to the smallest key) instead of blindly keeping the
   * minimum key. This is the cross-source resolution rule a corpus merge
   * needs — when the same document was crawled from a mirror AND its
   * origin, keep the copy from the preferred source, licensing tier, or
   * freshest snapshot.
   *
   * `priority` is any numeric expression over `docs`' columns (e.g.
   * `when(col("source") === "origin", 2).otherwise(1)`). Scale shape: the
   * winner per cluster is ONE map-side-combinable `min(struct(-priority,
   * key))` aggregation on the membership table (cluster-keyed, pair-graph
   * sized — orders smaller than the corpus); the loser set anti-joins
   * UN-hinted, so AQE broadcasts it only when it measures small (the same
   * discipline as every other loser anti-join here).
   */
  def resolveCanonical(docs: DataFrame, pairs: DataFrame,
                       aCol: String, bCol: String, keyCol: String,
                       priority: org.apache.spark.sql.Column,
                       maxIter: Int = 20,
                       checkpointDir: Option[String] = None,
                       driverThreshold: Long = 500000L): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol, outKey = keyCol,
      maxIter = maxIter, checkpointDir = checkpointDir,
      driverThreshold = driverThreshold)
    val members = comps.join(
      docs.select(col(keyCol), priority.cast("double").as("_prio")), Seq(keyCol))
    val winners = members.groupBy(col("cluster"))
      .agg(min(struct((-col("_prio")).as("np"), col(keyCol).as("k"))).as("_w"))
      .select(col("cluster"), col("_w.k").as("_winner"))
    val losers = members.join(winners, Seq("cluster"))
      .filter(col(keyCol) =!= col("_winner")).select(col(keyCol))
    docs.join(losers, Seq(keyCol), "left_anti")
  }
}
