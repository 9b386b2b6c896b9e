package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch same-JVM A/B for the containment pair-kernel rewrite (r18,
  * VERDICT #3). Forms: r17 (hot-agg + anti-join + self-join) vs r18
  * (one collect_list exchange + bounded array pair explode). Never
  * shipped; results recorded in OPTIMIZATION_r18.md. */
object ContainLab {

  private def postings(docs: DataFrame): DataFrame =
    Tables.spread(docs).select(col("doc_id").as("_k"),
      explode(graft.functions.ShingleFunctions.shingleHashes(col("text"), 3)).as("_s"))
      .distinct()

  /** The r17 shape verbatim. */
  def oldForm(sh: DataFrame, minContainment: Double, maxDf: Int): DataFrame = {
    val hot = sh.groupBy(col("_s")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") > maxDf)
    val f = CacheRegistry.track(sh.join(hot.select(col("_s")), Seq("_s"), "left_anti"))
    val sizes = f.groupBy(col("_k")).agg(count(lit(1)).as("_n"))
    f.select(col("_s"), col("_k").as("key_a"))
      .join(f.select(col("_s"), col("_k").as("key_b")), Seq("_s"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b")).agg(count(lit(1)).as("_shared"))
      .join(sizes.select(col("_k").as("key_a"), col("_n").as("_na")), Seq("key_a"))
      .join(sizes.select(col("_k").as("key_b"), col("_n").as("_nb")), Seq("key_b"))
      .select(col("key_a"), col("key_b"),
        round(col("_shared") / least(col("_na"), col("_nb")).cast("double"), 6)
          .as("containment"))
      .filter(col("containment") >= minContainment)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "documents").groupBy("lang").count().collect()

    def docs = Tables(spark, sfDir, "documents")
    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      CacheRegistry.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "old" -> (() => oldForm(postings(docs), 0.5, 20)),
      "new" -> (() => operators.Dedup.containmentPairs(docs, "text", "doc_id",
        3, 0.5, 20)))
    forms.foreach { case (_, f) => once(f()) } // warm
    (1 to 3).foreach { r =>
      forms.foreach { case (n, f) =>
        println(f"[containlab] round$r $n%-4s ${once(f())}%.3f")
      }
    }
    val a = oldForm(postings(docs), 0.5, 20).collect().map(_.toString).sorted
    val b = operators.Dedup.containmentPairs(docs, "text", "doc_id", 3, 0.5, 20)
      .collect().map(_.toString).sorted
    println(s"[containlab] identical: ${a.sameElements(b)} (${a.length} rows)")
    spark.stop()
  }
}
