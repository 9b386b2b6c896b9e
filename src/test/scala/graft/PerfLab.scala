package graft

/**
 * Same-JVM interleaved A/B timing for named entry queries — the sanctioned
 * triage tool for bench movements (test scope, never shipped).
 *
 * Why it exists: cross-JVM comparisons (two Bench runs) confound the thing
 * being measured with JIT state, page cache, and machine load — exactly the
 * noise that produced round 6's phantom 2x "regression" (driver bench under
 * contention; same code re-ran at half the time). Interleaving both arms in
 * ONE JVM and taking min-of-2 per arm cancels all of that.
 *
 * Usage (repeat a name to get repeated interleaved samples):
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *     sbt "Test/runMain graft.PerfLab q_distinct_set q_distinct_set"
 *
 * To A/B a CODE change, run the suspect query names, apply the candidate
 * edit, and run them again in the next invocation — the first sample of a
 * JVM pays warmup, so compare the later lines of each run.
 */
object PerfLab {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PerfLab <queryName> [<queryName> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "documents").groupBy("lang").count().collect() // warmup

    def once(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    args.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n' — names come from SparkEntry.queries"))
      val a1 = once(fn(spark, sfDir)); val a2 = once(fn(spark, sfDir))
      println(f"$n%-24s min=${math.min(a1, a2)}%.3f ($a1%.3f/$a2%.3f)")
    }
    spark.stop()
  }
}
