package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Patch

/** Scratch same-JVM A/B: q_patch_merge with and without Tables.spread on
  * the orders scan (r18 — the stashed r17 experiment, adjudicated here).
  * Never shipped; verdict recorded in OPTIMIZATION_r18.md. */
object PatchSpreadLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "orders").groupBy("o_orderstatus").count().collect()

    def body(base: DataFrame): DataFrame =
      Patch.applyPatch(base.withColumn("body", struct(
          map(lit("status"), col("o_orderstatus"),
            lit("prio"), col("o_orderpriority")).as("attrs"),
          col("o_totalprice").as("price"))), "body",
        Seq(Patch.MergeMap("attrs",
          map(lit("status"), lit("X"), lit("src"), lit("patch")))),
        condition = col("o_totalprice") > 250000.0)
        .select(col("o_orderkey"),
          element_at(col("body.attrs"), "status").as("status"),
          element_at(col("body.attrs"), "prio").as("prio"),
          element_at(col("body.attrs"), "src").as("src"))

    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "plain" -> (() => body(Tables(spark, sfDir, "orders"))),
      "spread" -> (() => body(Tables.spread(Tables(spark, sfDir, "orders")))))
    forms.foreach { case (_, f) => once(f()) }
    (1 to 4).foreach { r =>
      forms.foreach { case (n, f) =>
        println(f"[patchlab] round$r $n%-6s ${once(f())}%.3f")
      }
    }
    spark.stop()
  }
}
