package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.{TextFunctions => TF}

/** Local profiling aid (test scope only, never shipped): times variants of
  * the near-dup kernel to locate regressions. */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    docs.groupBy("lang").count().collect() // warmup

    // inline minhashLsh with knobs
    def lsh(spread: Int, eager: Boolean, persistLevel: Option[StorageLevel]): DataFrame = {
      val numHashes = 32; val bands = 16; val rowsPerBand = 2
      val threshold = 0.5; val keyCol = "doc_id"
      val in = if (spread > 0) docs.repartition(spread) else docs
      var base = in
        .select(col(keyCol), array_distinct(TF.shingles(col("text"), 3)).as("_sh"))
        .withColumn("_sig", TF.minhashSignature(col("_sh"), 32))
      persistLevel.foreach(l => base = base.persist(l))
      if (eager) base.count()
      val banded = base.select(
        col(keyCol),
        posexplode(array((0 until bands).map { b =>
          md5(concat_ws(",", slice(col("_sig"), b * rowsPerBand + 1, rowsPerBand)))
        }: _*)).as(Seq("_band", "_bh")))
      val cand = banded.as("a").join(banded.as("b"),
          col("a._band") === col("b._band") && col("a._bh") === col("b._bh") &&
            col(s"a.$keyCol") < col(s"b.$keyCol"))
        .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"))
        .dropDuplicates("key_a", "key_b")
      val out = cand
        .join(base.select(col(keyCol).as("key_a"), col("_sh").as("_sha")), Seq("key_a"))
        .join(base.select(col(keyCol).as("key_b"), col("_sh").as("_shb")), Seq("key_b"))
        .withColumn("jaccard", TF.jaccard(col("_sha"), col("_shb")))
        .filter(col("jaccard") >= threshold)
        .select(col("key_a"), col("key_b"), round(col("jaccard"), 6).as("jaccard"))
      out
    }

    // bench regime: min of two, cache REUSED between the two runs (like
    // Bench's min-of-two), cleared between variants
    def time(label: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); val df = mk
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val r1 = once(); val r2 = once()
      spark.sharedState.cacheManager.clearCache()
      println(f"$label%-44s ${math.min(r1, r2)}%.3f  ($r1%.3f/$r2%.3f)")
    }

    for (sp <- Seq(0, 4, 8, 16, 32)) {
      time(s"persist eager spread=$sp") { lsh(sp, eager = true, Some(StorageLevel.MEMORY_AND_DISK)) }
      time(s"persist lazy  spread=$sp") { lsh(sp, eager = false, Some(StorageLevel.MEMORY_AND_DISK)) }
    }
    spark.stop()
  }
}
