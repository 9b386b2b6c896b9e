package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

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

    def once(act: => Unit): Double = {
      val t0 = System.nanoTime()
      act
      (System.nanoTime() - t0) / 1e9
    }
    def bench(name: String)(act: => Unit): Unit = {
      val xs = (1 to 3).map(_ => once(act))
      println(f"$name%-28s min=${xs.min}%.3f  ${xs.map(x => f"$x%.3f").mkString("/")}")
    }

    def docs = Tables(spark, sfDir, "documents").filter(col("doc_id") < 250)
    val shingleN = 3
    val threshold = 0.3

    def shinglesDf = docs.select(col("doc_id").as("_k"),
      array_distinct(TF.shingles(col("text"), shingleN)).as("_s"))

    def exactPairsCount(): Unit = {
      val sh = shinglesDf
      val a = sh.select(col("_k").as("_ka"), col("_s").as("_sa"))
      val b = sh.select(col("_k").as("_kb"), col("_s").as("_sb"))
      val j = size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
        size(array_union(col("_sa"), col("_sb"))).cast("double")
      val n = a.join(b, col("_ka") < col("_kb"))
        .filter(size(array_union(col("_sa"), col("_sb"))) > 0 && j >= threshold)
        .count()
      println(s"  exact pairs = $n")
    }

    def exactPairsInverted(): Unit = {
      val sh = shinglesDf
      val sz = sh.select(col("_k"), size(col("_s")).as("_n"))
      val ex = sh.select(col("_k"), explode(col("_s")).as("_g"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a._g") === col("b._g") && col("a._k") < col("b._k"))
        .groupBy(col("a._k").as("_ka"), col("b._k").as("_kb"))
        .agg(count(lit(1)).as("_i"))
      val n = inter
        .join(sz.select(col("_k").as("_ka"), col("_n").as("_na")), Seq("_ka"))
        .join(sz.select(col("_k").as("_kb"), col("_n").as("_nb")), Seq("_kb"))
        .filter(col("_i").cast("double") /
          (col("_na") + col("_nb") - col("_i")).cast("double") >= threshold)
        .count()
      println(s"  exact pairs (inverted) = $n")
    }

    def lshFull(): Unit = {
      val n = SparkEntry.queries("q_lsh_recall")(spark, sfDir).collect().length
      println(s"  report rows = $n")
    }

    bench("exact_bnlj")(exactPairsCount())
    bench("exact_inverted")(exactPairsInverted())
    bench("q_lsh_recall_full")(lshFull())
    bench("exact_bnlj")(exactPairsCount())
    bench("exact_inverted")(exactPairsInverted())
    spark.stop()
  }
}
