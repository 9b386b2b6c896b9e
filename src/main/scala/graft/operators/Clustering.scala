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
 * Algorithm: iterative min-label propagation — every node repeatedly
 * adopts the minimum label among itself and its neighbors until fixpoint;
 * the component label is the smallest key in the component (deterministic
 * canonical winner, same convention as [[Dedup.exact]]).
 *
 * Scale shape: each iteration is one join (labels to edges) + one
 * aggregation (min per node) — all shuffles on the node key, nothing
 * quadratic, label table has one row per node appearing in any pair
 * (orders of magnitude smaller than the corpus). Iteration count is the
 * component DIAMETER, and LSH near-dup graphs are dense local cliques
 * with tiny diameters (2-4 hops), so convergence is fast; `maxIter`
 * bounds adversarial chains (for planet-scale general graphs, the
 * large-star/small-star variant halves diameters per round — not needed
 * for near-dup clusters). The per-iteration convergence check is one
 * count() on the changed-label set.
 */
object Clustering {

  /**
   * Connected components over an undirected pair list. Returns one row
   * per distinct node: (node under `outKey`, `cluster` = min key in its
   * component). Nodes absent from `pairs` are absent from the output (a
   * doc with no near-dup is its own trivial cluster — callers left-join
   * and coalesce to itself).
   */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          outKey: String = "key", maxIter: Int = 20): DataFrame = {
    val edges = graft.CacheRegistry.track(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"))
        .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
        .distinct())

    var labels = edges.select(col("u")).distinct()
      .withColumn("label", col("u"))
    var converged = false
    var iter = 0
    var prevCache: DataFrame = null
    while (!converged && iter < maxIter) {
      // each node adopts min(own label, neighbors' labels); the joined
      // frame is cached ONCE and serves both the convergence count and
      // the next label table — no separate compare join. Superseded
      // iteration caches are unpersisted as soon as the next one is
      // materialized, so cached state stays O(1) in iterations (only the
      // FINAL frame remains, released by the caller via CacheRegistry).
      val neighborMin = edges
        .join(labels.select(col("u").as("v"), col("label").as("vlabel")), Seq("v"))
        .groupBy(col("u")).agg(min(col("vlabel")).as("nmin"))
      val joined = graft.CacheRegistry.track(
        labels.join(neighborMin, Seq("u"), "left_outer"))
      val changed = joined.filter(col("nmin") < col("label")).count()
      if (prevCache != null) prevCache.unpersist(blocking = false)
      prevCache = joined
      labels = joined.select(col("u"),
        least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      // silently returning unconverged labels would split one duplicate
      // cluster into several and let duplicates survive dedup — refuse
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations — " +
          "component diameter exceeds maxIter (raise it, or use a " +
          "star-contraction variant for chain-shaped graphs)")
    labels.select(col("u").as(outKey), col("label").as("cluster"))
  }

  /** Canonical-per-cluster view: one surviving key per duplicate cluster
    * (the minimum — the cluster label itself). */
  def clusterWinners(components: DataFrame, keyCol: String): DataFrame =
    components.filter(col(keyCol) === col("cluster")).select(col(keyCol))

  /**
   * The full near-dup dedup: drop every NON-canonical cluster member from
   * `docs`, keep canonical winners and all unclustered docs — the
   * pairs → components → corpus composition a curation pipeline actually
   * ships. The loser set (one key column, orders of magnitude smaller
   * than the corpus) broadcasts into an anti-join, so the corpus itself
   * never shuffles.
   */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame,
                         aCol: String, bCol: String, keyCol: String): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol, outKey = keyCol)
    val losers = comps.filter(col(keyCol) =!= col("cluster")).select(col(keyCol))
    docs.join(broadcast(losers), Seq(keyCol), "left_anti")
  }
}
