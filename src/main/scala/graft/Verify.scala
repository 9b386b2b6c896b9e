package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = EngineSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q_a,q_b — iterate on a subset without paying the
    // full-suite wall time; unset = the driver's full run.
    // blank entries dropped so SPARK_GRAFT_ONLY="" (set-but-empty, the
    // usual unset-interpolation accident) means "full run", not Set("")
    // silently matching zero queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must not leave a PREVIOUS run's dump behind: a
        // reused outDir would hand the differential compare a stale —
        // possibly green — result, masking the very regression that just
        // threw
        try {
          val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true)
        } catch { case _: Throwable => () }
      }
      // release engine-held caches between queries — the same block-manager
      // discipline Bench applies: ~173 dumps otherwise accumulate every
      // signature-table persist and clustering localCheckpoint of the suite
      CacheRegistry.releaseAll()
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonUtil.str(k)}: ${JsonUtil.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
