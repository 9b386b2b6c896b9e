package graft
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.queryExecution.toRdd.count() // trigger AQE final plan
    println("=== FINAL PLAN " + args(0) + " ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
  }
}
