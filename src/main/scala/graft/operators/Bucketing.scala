package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed (co-partitioned) storage for shuffle-free equi-joins — the
 * 100 TB answer to the reference's hash-addressed swamp layout: HydrAIDE
 * routes each key to a deterministic folder/server
 * (reference: app/name/name.go:148-150 GetFullHashPath,
 * docs/how-hydraide-works.md "deterministic naming"), so lookups never
 * scan. Spark's equivalent for JOINs is bucketing: both sides
 * pre-hash-partitioned into the same number of buckets on the join key
 * means a sort-merge join with NO Exchange on either side — at 100 TB,
 * the shuffle that disappears here is the single largest cost of a
 * fact-to-fact join.
 *
 * Bucketed tables must live in the session catalog (`saveAsTable`), so
 * registration goes through a table name, not a bare path.
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted-in-bucket catalog table. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts the plan contains no Exchange (verify via explain). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keyCol: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(keyCol), joinType)
}
