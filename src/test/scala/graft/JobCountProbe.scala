package graft

/** Scratch probe (test scope): the DETERMINISTIC decomposition evidence
  * behind the calibration-family floor law in BENCH_NOTES — counts Spark
  * jobs, stages, and tasks for named queries via a SparkListener instead
  * of timing them (the shared box makes timing A/Bs unreliable; job/stage
  * structure is a property of the plan). Usage:
  *   sbt "Test/runMain graft.JobCountProbe <sfDir> [query ...]"
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobCountProbe <sfDir> [query ...]")
    val sfDir = args.head
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_quality_calibrated", "q_curriculum")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).queryExecution.toRdd.count() // warm (codegen, FS)
      Thread.sleep(500) // listener bus drain (no public waitUntilEmpty)
      jobs.set(0); stages.set(0); tasks.set(0)
      fn(spark, sfDir).queryExecution.toRdd.count()
      Thread.sleep(500)
      println(s"[jobcount] $n jobs=${jobs.get} stages=${stages.get} " +
        s"tasks=${tasks.get}")
      CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
