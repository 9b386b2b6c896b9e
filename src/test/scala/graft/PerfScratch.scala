package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Local profiling aid (test scope only, never shipped): same-JVM A/B of
  * the LambdaCse optimizer rule's end-to-end cost per query. */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // plain session (no extensions) so the rule can be toggled per run
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "documents").groupBy("lang").count().collect() // warmup

    def once(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_eq", "q_topk", "q_quality", "q_langid",
        "q_minhash_sig", "q_simhash", "q_nested_any", "q_ngram_jaccard")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // interleaved ABAB, min of 2 each
      def withRule[A](on: Boolean)(f: => A): A = {
        spark.experimental.extraOptimizations =
          if (on) Seq(graft.plans.LambdaCse) else Nil
        try f finally spark.experimental.extraOptimizations = Nil
      }
      val off1 = withRule(false)(once(fn)); val on1 = withRule(true)(once(fn))
      val off2 = withRule(false)(once(fn)); val on2 = withRule(true)(once(fn))
      println(f"$n%-22s off=${math.min(off1, off2)}%.3f on=${math.min(on1, on2)}%.3f")
    }
    spark.stop()
  }
}
