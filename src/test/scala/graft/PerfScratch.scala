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

    // force index builds once
    TermStats.bm25TopKBatchPrebuilt(spark, tIdx, "doc_id", textQs, "qid",
      "terms", k = 20).collect()
    Similarity.pqTopKBatchPrebuilt(spark, pIdx, vecQs, "qid", "embedding",
      "vec_id", k = 20).collect()

    def postingsScan: DataFrame = {
      val d = graft.operators.IndexLifecycle.resolveDir(spark, tIdx)
      val qterms = textQs.select(col("qid").as("_qid"),
        explode(array_distinct(col("terms"))).as("term"))
      val dict = qterms.select(col("term")).distinct()
      spark.read.parquet(s"$d/postings").join(broadcast(dict), Seq("term"), "left_semi")
    }
    def bm25Full: DataFrame = TermStats.bm25TopKBatchPrebuilt(spark, tIdx,
      "doc_id", textQs, "qid", "terms", k = 20, rankCol = Some("_rank"))
    def pqFull: DataFrame = Similarity.pqTopKBatchPrebuilt(spark, pIdx, vecQs,
      "qid", "embedding", "vec_id", k = 20, rankCol = Some("_rank"))
    def hybridFull: DataFrame = SparkEntry.queries("q_hybrid_batch")(spark, sfDir)

    bench("postingsScan", postingsScan)
    bench("bm25Full", bm25Full)
    bench("pqFull", pqFull)
    bench("hybridFull", hybridFull)
    bench("bm25Full", bm25Full)
    bench("pqFull", pqFull)
    spark.stop()
  }
}
