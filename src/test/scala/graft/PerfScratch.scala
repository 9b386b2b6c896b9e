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

    def orders = Tables(spark, sfDir, "orders")
    def currA: DataFrame = SparkEntry.queries("q_curriculum")(spark, sfDir)
    def edgesOnly: DataFrame = orders.agg(
      graft.operators.Percentiles.sortedVals(col("o_totalprice")).as("_sv"))
      .select(array(Seq(0.25, 0.5, 0.75).map(q =>
        round(graft.operators.Percentiles.fromSorted(col("_sv"), q), 6)): _*).as("_edges"))

    def currCached: DataFrame = {
      val slim = CacheRegistry.track(orders.select("o_orderkey", "o_totalprice"))
      graft.operators.Sampling.curriculumSample(
        slim, "o_orderkey", "o_totalprice", Seq(0.05, 0.2, 0.5, 1.0))
        .select(col("o_orderkey"), col("o_totalprice"))
    }
    bench("currA_current", currA)
    bench("currCached", currCached)
    bench("currA_current", currA)
    bench("currCached", currCached)
    spark.stop()
  }
}
