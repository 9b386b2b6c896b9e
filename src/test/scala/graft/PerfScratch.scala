package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scratch variant A/B bench (test scope, never shipped): candidate plan
 * shapes, timed interleaved in one JVM like [[PerfLab]]. Edit freely
 * between runs — nothing references this from main code.
 */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "documents").groupBy("lang").count().collect()

    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def bench(name: String, df: => DataFrame): Unit = {
      val xs = (1 to 4).map(_ => once(df))
      println(f"$name%-28s min=${xs.min}%.3f  ${xs.map(x => f"$x%.3f").mkString("/")}")
    }

    import graft.operators.Dedup
    import graft.functions.{TextFunctions => TF}

    val sigPath = java.nio.file.Files
      .createTempDirectory("graft_scratch_sig_").resolve("sigs").toString
    Dedup.buildSignatures(Tables(spark, sfDir, "documents"), "text", "doc_id",
      sigPath, shingleN = 3, numHashes = 16)
    val dir = graft.operators.IndexLifecycle.resolveDir(spark, sigPath)

    val bands = 4; val rpb = 4; val threshold = 0.5

    def bandedOf(base: DataFrame): DataFrame =
      base.select(col("doc_id"),
        posexplode(array((0 until bands).map { b =>
          md5(concat_ws(",", slice(col("_sig"), b * rpb + 1, rpb)))
        }: _*)).as(Seq("_band", "_bh")))

    def cand: DataFrame = {
      val banded = bandedOf(spark.read.parquet(dir))
      banded.as("a").join(banded.as("b"),
          col("a._band") === col("b._band") && col("a._bh") === col("b._bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("key_a"), col("b.doc_id").as("key_b"))
        .dropDuplicates("key_a", "key_b")
    }
    def withSets: DataFrame = {
      val base = spark.read.parquet(dir)
      cand
        .join(base.select(col("doc_id").as("key_a"), col("_sh").as("_sha")), Seq("key_a"))
        .join(base.select(col("doc_id").as("key_b"), col("_sh").as("_shb")), Seq("key_b"))
    }

    bench("s1_cand_only", cand)
    bench("s2_joins_sizes_only", withSets
      .select((size(col("_sha")) + size(col("_shb"))).as("n")))
    bench("s3_plus_jaccard", withSets
      .withColumn("jaccard", TF.jaccard(col("_sha"), col("_shb")))
      .select(col("key_a"), col("key_b"), col("jaccard")))
    bench("s4_full_filterthresh", withSets
      .withColumn("jaccard", TF.jaccard(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"), round(col("jaccard"), 6).as("jaccard")))
    // raw-intersect jaccard (no redundant array_distinct — inputs are sets)
    def jacRaw(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val inter = size(array_intersect(a, b)).cast("double")
      val uni = (size(a) + size(b)).cast("double") - inter
      when(uni === 0, lit(0.0)).otherwise(inter / uni)
    }
    bench("s5_jaccard_no_distinct", withSets
      .withColumn("jaccard", jacRaw(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"), round(col("jaccard"), 6).as("jaccard")))
    spark.stop()
  }
}
