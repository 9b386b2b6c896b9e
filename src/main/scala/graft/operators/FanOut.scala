package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ManyToMany fan-out write — the reference's reverse-index ingestion writes
 * one (tag -> members) swamp per tag from rows that each carry many tags
 * (reference: docs/use-cases + sdk CatalogSaveManyToMany patterns).
 *
 * Spark form: explode the tag array and `partitionBy(tag)` on write — each
 * tag's rows land in their own partition directory, so a later read of one
 * tag is a partition-pruned scan (the directory IS the swamp). The explode
 * is map-side only; the write shuffles nothing unless `repartition` is
 * requested to bound small files (at 100 TB you repartition by tag so each
 * output partition is written by one task — included below).
 */
object FanOut {

  /** Explode `tagsCol` to one row per (tag, row). The output name must be
    * fresh: writing into an existing column would silently clobber its
    * data just before the partitioned write, and `tagOut == tagsCol`
    * would drop the just-exploded output. */
  def explodeTags(df: DataFrame, tagsCol: String, tagOut: String = "tag"): DataFrame = {
    require(tagOut != tagsCol,
      s"tag output column '$tagOut' must differ from the tags array " +
        "column it explodes — the drop would delete the output")
    require(!df.columns.contains(tagOut),
      s"input already contains a '$tagOut' column — it would be " +
        "silently overwritten; pass a different tagOut")
    df.withColumn(tagOut, explode(col(tagsCol))).drop(tagsCol)
  }

  /**
   * Fan-out write partitioned by tag. `coalescePerTag` repartitions by the
   * tag first so each tag directory is written by a single task — the
   * small-files guard a 1000-executor write needs.
   */
  def writeTagPartitions(df: DataFrame, tagsCol: String, outPath: String,
                         coalescePerTag: Boolean = true): Unit = {
    val exploded = explodeTags(df, tagsCol)
    val arranged = if (coalescePerTag) exploded.repartition(col("tag")) else exploded
    arranged.write.mode("overwrite").partitionBy("tag").parquet(outPath)
  }
}
