package graft

/** Scratch probe (test scope): which entry-query plans carry a LambdaCse
  * let-binding. Deterministic (plan shape, no timing) — used to A/B census
  * policy changes: if the bound-plan set is identical across two rule
  * versions, the change cannot have moved any suite benchmark. */
object CseCensusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = EngineSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bound = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan.toString
        if (plan.contains("_graft_cse")) Some(n) else None
      } catch { case e: Throwable => Some(s"$n!ERR:${e.getClass.getSimpleName}") }
    }
    println(s"[cse-census] bound=${bound.size}: ${bound.mkString(",")}")
    spark.stop()
  }
}
