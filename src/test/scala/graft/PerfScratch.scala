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

    import spark.implicits._
    import graft.operators.{TermStats, Similarity}
    val textQs = Seq(
      (0L, Seq("data", "spark", "index")),
      (1L, Seq("spark", "table")),
      (2L, Seq("index", "data"))).toDF("qid", "terms")
    def vecQs = Tables(spark, sfDir, "embeddings").filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val tIdx = SparkEntry.textIndexPath(spark, sfDir)
    val pIdx = SparkEntry.pqIndexPath(spark, sfDir)

    def fused: DataFrame = TermStats.hybridRrfBatchPrebuilt(spark,
      tIdx, "doc_id", textQs, "qid", "terms",
      pIdx, vecQs, "qid", "embedding", kKernel = 20, k = 10)
    def composed: DataFrame = {
      val text = TermStats.bm25TopKBatchPrebuilt(spark, tIdx, "doc_id",
        textQs, "qid", "terms", k = 20, rankCol = Some("_rank"))
      val vec = Similarity.pqTopKBatchPrebuilt(spark, pIdx, vecQs,
        "qid", "embedding", "vec_id", k = 20, rankCol = Some("_rank"))
      TermStats.rrfFuseBatchRanked(text, "qid", "doc_id", "_rank",
        vec, "vec_id", "_rank", k = 10)
    }
    def bm25Only: DataFrame = TermStats.bm25TopKBatchPrebuilt(spark, tIdx,
      "doc_id", textQs, "qid", "terms", k = 20, rankCol = Some("_rank"))
    def pqOnly: DataFrame = Similarity.pqTopKBatchPrebuilt(spark, pIdx, vecQs,
      "qid", "embedding", "vec_id", k = 20, rankCol = Some("_rank"))

    bench("fused", fused)
    bench("composed", composed)
    bench("bm25Only", bm25Only)
    bench("pqOnly", pqOnly)
    bench("fused", fused)
    bench("composed", composed)
    spark.stop()
  }
}
