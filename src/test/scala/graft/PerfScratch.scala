package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup

/** Local profiling aid (test scope only, never shipped): interleaved
  * same-JVM A/B of candidate perf changes. */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    docs.groupBy("lang").count().collect() // warmup

    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // args = named queries: interleaved ABAB min-of-2 per query (the
    // single-query iteration aid); no args = the fixed A/B experiments
    if (args.nonEmpty) {
      args.foreach { n =>
        val fn = SparkEntry.queries(n)
        val a1 = once(fn(spark, sfDir)); val a2 = once(fn(spark, sfDir))
        println(f"$n%-24s min=${math.min(a1, a2)}%.3f ($a1%.3f/$a2%.3f)")
      }
      spark.stop(); return
    }

    def curation(in: DataFrame): DataFrame =
      Dedup.exact(in, "text", "doc_id")
        .withColumn("quality", TF.qualityScore(col("text")))
        .withColumn("lang_pred", TF.langId(col("text")))
        .filter(col("quality") >= 0.4 && col("lang_pred") === "en" &&
          TF.tokenCount(col("text")) >= 8)
        .select(col("doc_id"), col("quality"))

    // interleaved ABAB x3, min per arm
    val offs = collection.mutable.ArrayBuffer[Double]()
    val ons = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 3) {
      offs += once(curation(docs))
      ons += once(curation(Tables.spread(docs)))
    }
    println(f"curation plain  min=${offs.min}%.3f  (${offs.map(v => f"$v%.3f").mkString("/")})")
    println(f"curation spread min=${ons.min}%.3f  (${ons.map(v => f"$v%.3f").mkString("/")})")

    // embedding near-dup baseline cost (pipeline as shipped)
    val emb = Tables(spark, sfDir, "embeddings")
    val e1 = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 3) e1 += once(Dedup.embeddingNearDup(emb, "embedding", "vec_id", 0.3))
    println(f"embeddingNearDup min=${e1.min}%.3f  (${e1.map(v => f"$v%.3f").mkString("/")})")
    spark.stop()
  }
}
