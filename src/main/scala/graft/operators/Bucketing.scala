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

  /** Join two bucketed tables on their bucket key. The whole point of
    * this operator is the ABSENT Exchange, so a spec mismatch (different
    * bucket counts, a table not bucketed on `keyCol`, or one never
    * bucketed at all) refuses loudly instead of silently planning the
    * full shuffle the caller bucketed to avoid — at 100 TB that silent
    * shuffle IS the cost of the job. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keyCol: String, joinType: String = "inner"): DataFrame = {
    def spec(table: String) = {
      val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
      spark.sessionState.catalog.getTableMetadata(id).bucketSpec
    }
    val specs = Seq(leftTable, rightTable).map { tbl =>
      val s = spec(tbl)
      require(s.exists(_.bucketColumnNames == Seq(keyCol)),
        s"table $tbl is not bucketed on '$keyCol' " +
          s"(bucketSpec=${s.orNull}) — the join would silently shuffle; " +
          "rewrite it with writeBucketed first")
      s.get
    }
    require(specs(0).numBuckets == specs(1).numBuckets,
      s"bucket counts differ (${specs(0).numBuckets} vs " +
        s"${specs(1).numBuckets}) — the smaller side would " +
        "silently shuffle; rebucket to a common count")
    spark.table(leftTable).join(spark.table(rightTable), Seq(keyCol), joinType)
  }
}
