package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  * Each query is timed as min of two runs after a global warmup, so the
  * numbers measure the plan, not JVM/codegen cold start. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: exercise scan + shuffle + codegen machinery once
    Tables(spark, sfDir, "lineitem").groupBy("l_returnflag").count().collect()

    // Time FULL evaluation of every output column: `df.count()` lets Catalyst
    // prune projections (a compute-heavy select would be timed as just the
    // scan), so we count the *internal-row* RDD of the final plan — every
    // expression in the query runs, nothing is collected to the driver.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // optional args = run only the named queries (local iteration aid);
    // the driver invokes with no args and gets the full suite
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    val results = wanted.map { case (name, fn) =>
      val sec =
        try math.min(timeOnce(fn), timeOnce(fn))
        catch { case _: Throwable => -1.0 }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
